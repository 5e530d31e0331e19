"""Pure-JAX soft-silhouette rasterizer — the differentiable oracle.

Semantics follow PyTorch3D's SoftSilhouetteShader (SoftRas aggregation) as used
by the reference (``smal_fitter/p3d_renderer.py:41-52``): per pixel,

    alpha = 1 − ∏_f (1 − sigmoid(−d_f / σ)),   σ = 1e-4,

where ``d_f`` is the *signed squared* euclidean distance in NDC xy between the
pixel center and face f (negative inside). We aggregate over **all** faces in
stable log-space:

    S = Σ_f softplus(−d_f / σ),   alpha = 1 − exp(−S),

which is exact, order-independent, and smooth — whereas PyTorch3D approximates
with the 100 nearest faces per pixel (faces_per_pixel=100). For meshes at this
face count the difference is below float tolerance away from degenerate depth
stacks, and the exact form needs no sort — the property that makes the Pallas
kernel a pure streaming reduction.

Distance convention (PyTorch3D ``point_line_distance``/``point_triangle_distance``):
d = min over the three edges of the squared point-segment distance, negated when
the pixel is inside the triangle.

This module is plain jnp (runs on CPU for tests, differentiable by autodiff);
``rasterizer.py`` holds the Pallas TPU kernel with a custom VJP that matches it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SIGMA = 1e-4  # reference BlendParams(sigma=1e-4)


def pixel_ndc_grid(image_size, dtype=jnp.float32):
    """Pixel-center NDC coordinates; (H, W, 2) with [..., 0]=x_ndc, [..., 1]=y_ndc.

    PyTorch3D NDC: +X left, +Y up; pixel (0, 0) is top-left. For square images
    x_ndc(col j) = 1 − (2j+1)/W, y_ndc(row i) = 1 − (2i+1)/H. For non-square,
    the shorter side spans [-1, 1] and the longer side proportionally more.
    """
    H, W = image_size
    s = min(H, W)
    ys = (jnp.arange(H, dtype=dtype) * 2.0 + 1.0 - H) / s  # top row → -(H-1)/s ... flipped below
    xs = (jnp.arange(W, dtype=dtype) * 2.0 + 1.0 - W) / s
    y_ndc = -ys  # +Y up: row 0 (top) has the largest y_ndc
    x_ndc = -xs  # +X left: col 0 has the largest x_ndc
    xg, yg = jnp.meshgrid(x_ndc, y_ndc, indexing="xy")
    return jnp.stack([xg, yg], axis=-1)


def _point_segment_sq(px, py, ax, ay, bx, by):
    """Squared distance from point to segment, plus the clamp parameter t."""
    ex, ey = bx - ax, by - ay
    dx, dy = px - ax, py - ay
    # per-face reciprocal instead of a full pixel-grid divide (matches the
    # Pallas kernel's math exactly)
    seg_rinv = 1.0 / jnp.maximum(ex * ex + ey * ey, 1e-12)
    t = (dx * ex + dy * ey) * seg_rinv
    t = jnp.clip(t, 0.0, 1.0)
    rx = dx - t * ex
    ry = dy - t * ey
    return rx * rx + ry * ry


def signed_distance_to_faces(pix, tri):
    """Signed squared distance between pixels and triangles (broadcasting).

    Args:
      pix: (..., 2) pixel NDC xy.
      tri: (..., 3, 2) triangle vertex NDC xy (broadcast-compatible).

    Returns signed squared distance, negative inside.
    """
    px, py = pix[..., 0], pix[..., 1]
    ax, ay = tri[..., 0, 0], tri[..., 0, 1]
    bx, by = tri[..., 1, 0], tri[..., 1, 1]
    cx, cy = tri[..., 2, 0], tri[..., 2, 1]

    d_ab = _point_segment_sq(px, py, ax, ay, bx, by)
    d_bc = _point_segment_sq(px, py, bx, by, cx, cy)
    d_ca = _point_segment_sq(px, py, cx, cy, ax, ay)
    d = jnp.minimum(jnp.minimum(d_ab, d_bc), d_ca)

    # inside test via edge cross products (winding-agnostic)
    c0 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    c1 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
    c2 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
    return jnp.where(inside, -d, d)


@partial(jax.jit, static_argnames=("image_size", "sigma", "face_chunk", "znear"))
def soft_silhouette_ref(
    verts_ndc: jnp.ndarray,
    faces: jnp.ndarray,
    image_size,
    sigma: float = SIGMA,
    face_chunk: int = 512,
    znear: float = 0.0,
) -> jnp.ndarray:
    """Render a soft silhouette from NDC-space vertices.

    Args:
      verts_ndc: (V, 3) vertices in NDC (x, y) + view-space depth z.
      faces: (F, 3) int triangle indices.
      image_size: (H, W).
      sigma: blur parameter.
      face_chunk: faces processed per scan step (memory control).
      znear: faces whose every vertex has z <= znear are culled.

    Returns (H, W) alpha in [0, 1]. Differentiable wrt verts_ndc.
    """
    H, W = image_size
    pix = pixel_ndc_grid(image_size, dtype=verts_ndc.dtype)  # (H, W, 2)

    F = faces.shape[0]
    pad = (-F) % face_chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((F,), dtype=bool), (0, pad))
    n_chunks = faces_p.shape[0] // face_chunk
    faces_c = faces_p.reshape(n_chunks, face_chunk, 3)
    valid_c = valid.reshape(n_chunks, face_chunk)

    # remat: the (H, W, C) distance intermediates would otherwise be saved per
    # scan step for the backward pass — recompute them instead
    @jax.checkpoint
    def body(S, chunk):
        f_idx, f_valid = chunk
        tri = verts_ndc[f_idx]  # (C, 3, 3)
        z_ok = jnp.any(tri[..., 2] > znear, axis=-1)
        ok = f_valid & z_ok
        d = signed_distance_to_faces(pix[:, :, None, :], tri[None, None, :, :, :2])  # (H, W, C)
        contrib = jax.nn.softplus(-d / sigma)
        contrib = jnp.where(ok[None, None, :], contrib, 0.0)
        return S + contrib.sum(axis=-1), None

    S0 = jnp.zeros((H, W), dtype=verts_ndc.dtype)
    S, _ = jax.lax.scan(body, S0, (faces_c, valid_c))
    return 1.0 - jnp.exp(-S)
