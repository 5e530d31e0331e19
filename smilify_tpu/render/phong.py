"""Hard z-buffer rasterization + Phong shading for visualization.

Equivalent of the reference's hard Phong color renderer
(``smal_fitter/p3d_renderer.py:54-70``: faces_per_pixel=1, blur 0, one point
light at (0, 0, 3), per-vertex constant texture color). Non-differentiable
visualization path — plain jnp, chunked over faces, jit-compatible.

Top-1 face selection is a streaming argmin over face chunks: for each pixel we
keep (best_z, best_face, barycentrics). Shading is PyTorch3D-style Phong with
ambient/diffuse/specular = (0.5, 0.3, 0.2) white light defaults.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from smilify_tpu.render.rasterizer_ref import pixel_ndc_grid

MESH_COLOR = (0.0, 172.0 / 255.0, 223.0 / 255.0)  # reference config.MESH_COLOR


def _barycentrics(px, py, tri):
    """Barycentric components as a TUPLE of (..., C) arrays, not stacked.

    Stacking to (H, W, C, 3) puts 3 on the minor axis, which TPU tiling
    T(8,128) pads to 128 — a 42x memory blowup that OOMs HBM at image sizes
    >=224 (observed: a 26 GB allocation for f32[2,224,224,512,3]). Separate
    (H, W, C) arrays tile cleanly."""
    ax, ay = tri[..., 0, 0], tri[..., 0, 1]
    bx, by = tri[..., 1, 0], tri[..., 1, 1]
    cx, cy = tri[..., 2, 0], tri[..., 2, 1]
    den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    w0 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / den
    w1 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / den
    w2 = 1.0 - w0 - w1
    return w0, w1, w2


@partial(jax.jit, static_argnames=("image_size", "face_chunk", "znear"))
def rasterize_hard(verts_ndc, faces, image_size, face_chunk=512, znear=1e-3):
    """Top-1 rasterization.

    Args:
      verts_ndc: (V, 3) NDC xy + view-space z.
      faces: (F, 3) int32.
    Returns:
      pix_face: (H, W) int32 face id (−1 for background)
      bary: (H, W, 3) barycentric coordinates
      zbuf: (H, W) view z of the hit (inf for background)
    """
    H, W = image_size
    pix = pixel_ndc_grid(image_size, dtype=verts_ndc.dtype)
    px, py = pix[..., 0], pix[..., 1]

    F = faces.shape[0]
    pad = (-F) % face_chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((F,), dtype=bool), (0, pad))
    n_chunks = faces_p.shape[0] // face_chunk

    init = (
        jnp.full((H, W), jnp.inf, verts_ndc.dtype),
        jnp.full((H, W), -1, jnp.int32),
        jnp.zeros((H, W, 3), verts_ndc.dtype),
    )

    def body(carry, chunk_id):
        zbuf, fid, bary = carry
        idx = chunk_id * face_chunk + jnp.arange(face_chunk)
        f = faces_p[idx]
        ok = valid[idx]
        tri = verts_ndc[f]  # (C, 3, 3)
        w0, w1, w2 = _barycentrics(
            px[..., None], py[..., None], tri[None, None, :, :, :2]
        )  # 3x (H,W,C)
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        z = w0 * tri[:, 0, 2] + w1 * tri[:, 1, 2] + w2 * tri[:, 2, 2]
        z_ok = z > znear
        hit = inside & z_ok & ok[None, None, :]
        z_masked = jnp.where(hit, z, jnp.inf)
        best_c = jnp.argmin(z_masked, axis=-1)  # (H, W)
        sel = lambda a: jnp.take_along_axis(a, best_c[..., None], axis=-1)[..., 0]  # noqa: E731
        best_z = sel(z_masked)
        better = best_z < zbuf
        new_zbuf = jnp.where(better, best_z, zbuf)
        new_fid = jnp.where(better, idx[best_c].astype(jnp.int32), fid)
        best_w = jnp.stack([sel(w0), sel(w1), sel(w2)], axis=-1)  # (H,W,3) small
        new_bary = jnp.where(better[..., None], best_w, bary)
        return (new_zbuf, new_fid, new_bary), None

    (zbuf, fid, bary), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return fid, bary, zbuf


@partial(jax.jit, static_argnames=("image_size",))
def render_phong(
    verts_world,
    verts_view,
    verts_ndc,
    faces,
    image_size,
    color=MESH_COLOR,
    light_location=(0.0, 0.0, 3.0),
    ambient=0.5,
    diffuse=0.3,
    specular=0.2,
    shininess=64.0,
    background=(1.0, 1.0, 1.0),
):
    """Hard Phong render; returns (H, W, 3) float image in [0, 1].

    Lighting is computed in view space with a point light (PyTorch3D
    PointLights defaults scaled by the reference's renderer setup).
    """
    H, W = image_size
    fid, bary, zbuf = rasterize_hard(verts_ndc, faces, image_size)
    hit = fid >= 0
    fid_s = jnp.maximum(fid, 0)

    tri_view = verts_view[faces[fid_s]]          # (H, W, 3, 3)
    pos = jnp.einsum("hwv,hwvc->hwc", bary, tri_view)

    # per-face normals in view space
    v0 = verts_view[faces[:, 0]]
    v1 = verts_view[faces[:, 1]]
    v2 = verts_view[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    n = fn[fid_s]
    # flip normals toward the camera (camera looks along +z; pixel→camera is −pos)
    view_dir = -pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-12)
    n = jnp.where(jnp.sum(n * view_dir, axis=-1, keepdims=True) < 0, -n, n)

    light = jnp.asarray(light_location, dtype=pos.dtype)
    l_dir = light - pos
    l_dir = l_dir / jnp.maximum(jnp.linalg.norm(l_dir, axis=-1, keepdims=True), 1e-12)

    diff = jnp.maximum(jnp.sum(n * l_dir, axis=-1), 0.0)
    h = l_dir + view_dir
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    spec = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0) ** shininess

    base = jnp.asarray(color, dtype=pos.dtype)
    shade = (ambient + diffuse * diff[..., None]) * base + specular * spec[..., None]
    bg = jnp.asarray(background, dtype=pos.dtype)
    img = jnp.where(hit[..., None], shade, bg)
    return jnp.clip(img, 0.0, 1.0)
