"""Pallas TPU soft-silhouette rasterizer with custom VJP.

Replaces PyTorch3D's CUDA MeshRasterizer + SoftSilhouetteShader
(reference ``smal_fitter/p3d_renderer.py:41-52``). Same aggregation semantics
as :mod:`rasterizer_ref` (exact log-space SoftRas product over all faces):

    S(p)  = Σ_f softplus(−d_f(p) / σ)          (streaming reduction)
    alpha = 1 − exp(−S)

Design (TPU-first — no scalar loops, no dynamic indexing):
  * the image is split into **32×32 pixel tiles** flattened to 1024 lanes —
    near-square tiles keep the cull window tight in both axes (an 8×128 tile
    would make x-culling useless: the window spans half the image);
  * faces are packed into chunks of 512 with attributes last — inside the
    kernel a chunk is processed as 64 statically-unrolled sub-groups of
    **8 faces on sublanes × 1024 pixels on lanes**, so every op is a full
    (8, 1024) VPU vector op;
  * the forward grid is (frames, pixel_tiles, face_chunks) with chunks
    innermost, accumulating S into the revisited output tile — **frames are a
    native grid axis**, not an outer vmap, so multi-frame windows amortize the
    per-program grid overhead;
  * a host-precomputed **coarse cull mask** (subgroup bbox vs tile bbox + blur
    margin, delivered via scalar prefetch; one 16-bit word per 128 faces)
    skips non-overlapping programs and subgroups — the TPU analogue of
    PyTorch3D's binned rasterization. Large 512-face chunks keep the grid
    small (programs cost ~0.15 µs even when fully culled);
  * the backward kernel transposes the grid (chunks outer, tiles inner) and
    accumulates per-vertex distance gradients (envelope theorem at the
    optimal edge parameter), reduced over lanes.

The public entry :func:`soft_silhouette` takes NDC vertices + faces for one
frame (V, 3) or a frame batch (N, V, 3), is differentiable wrt vertices, and
falls back to the pure-JAX oracle on non-TPU backends.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smilify_tpu.render.rasterizer_ref import SIGMA, soft_silhouette_ref

TILE_H = 32
TILE_W = 32
TILE_PIX = TILE_H * TILE_W        # 1024 lanes per pixel tile
FACE_CHUNK = 512                  # faces per VMEM block / grid step
WORD = 128                        # faces covered by one 16-bit cull word
FACE_GROUP = 8                    # faces per sublane group
N_WORDS = FACE_CHUNK // WORD
GROUPS_PER_WORD = WORD // FACE_GROUP
# softplus(-d/σ) < 8.3e-7 once d > 14σ — faces farther than this contribute
# less than ~2e-5 alpha even with dozens of them at the cutoff
CULL_MARGIN_SQ_SIGMAS = 14.0
# once EVERY pixel of a tile has S > 20 (alpha within e⁻²⁰≈2e-9 of 1), later
# face chunks cannot change the tile — interior tiles skip their whole depth
# stack (one covering face already contributes |d|/σ ≫ 20)
SATURATION_S = 20.0
# v5e SMEM is 1 MB; the scalar-prefetch cull mask must fit (with headroom for
# other SMEM users), so large frame windows are split into sub-batches
SMEM_MASK_BUDGET_BYTES = 384 * 1024


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# shared in-kernel math (broadcasts (8,1) face attrs against (1,1024) pixels)
# ---------------------------------------------------------------------------


def _point_segment_sq_t(px, py, ax, ay, bx, by):
    ex, ey = bx - ax, by - ay
    dx, dy = px - ax, py - ay
    # segment length is per-face (8,1): divide once there instead of a full
    # (8, TILE_PIX) vector divide (VPU divides cost multiple mul-cycles)
    seg_rinv = 1.0 / jnp.maximum(ex * ex + ey * ey, 1e-12)
    t = (dx * ex + dy * ey) * seg_rinv
    t = jnp.clip(t, 0.0, 1.0)
    rx = dx - t * ex
    ry = dy - t * ey
    # signed area of (edge × point) — reuses dx/dy so the caller's inside
    # test costs 3 extra ops per edge instead of a fresh 6-op cross product
    cross = ex * dy - ey * dx
    return rx * rx + ry * ry, t, rx, ry, cross


def _signed_distance(px, py, ax, ay, bx, by, cx, cy):
    d1, t1, r1x, r1y, c0 = _point_segment_sq_t(px, py, ax, ay, bx, by)
    d2, t2, r2x, r2y, c1 = _point_segment_sq_t(px, py, bx, by, cx, cy)
    d3, t3, r3x, r3y, c2 = _point_segment_sq_t(px, py, cx, cy, ax, ay)
    dmin = jnp.minimum(jnp.minimum(d1, d2), d3)

    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
    sign = jnp.where(inside, -1.0, 1.0)
    return sign * dmin, (d1, t1, r1x, r1y, d2, t2, r2x, r2y, d3, t3, r3x, r3y, dmin, sign)


def _pixel_coords(t, n_tx, H, W, dtype):
    """NDC coords of the flattened (1, TILE_PIX) 32×32 pixel tile with id t."""
    s = float(min(H, W))
    q = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    ti = t // n_tx
    tj = t % n_tx
    rows = ti * TILE_H + q // TILE_W
    cols = tj * TILE_W + q % TILE_W
    y = -(rows.astype(dtype) * 2.0 + 1.0 - H) / s
    x = -(cols.astype(dtype) * 2.0 + 1.0 - W) / s
    return x, y


def _face_group(face_ref, w, g):
    """8 consecutive faces' attributes as (8, 1) columns."""
    base = w * WORD + g * FACE_GROUP
    fa = face_ref[0, 0, base:base + FACE_GROUP, :]  # (8, 8)
    return (
        fa[:, 0:1], fa[:, 1:2], fa[:, 2:3], fa[:, 3:4],
        fa[:, 4:5], fa[:, 5:6], fa[:, 6:7],
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(mask_ref, face_ref, S_ref, *, H, W, n_tx, n_tiles, n_chunks, inv_sigma):
    f = pl.program_id(0)
    t = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        S_ref[:] = jnp.zeros_like(S_ref)

    base = ((f * n_tiles + t) * n_chunks + c) * N_WORDS
    words = [mask_ref[base + w] for w in range(N_WORDS)]
    any_bits = functools.reduce(lambda a, b: a | b, words)

    @pl.when(any_bits > 0)
    def _():
        # saturation early-out: checked only on bitmask-active programs so
        # culled programs stay free of the (1, 1024) reduction
        @pl.when(jnp.min(S_ref[...]) < SATURATION_S)
        def _():
            px, py = _pixel_coords(t, n_tx, H, W, S_ref.dtype)
            for w in range(N_WORDS):
                for g in range(GROUPS_PER_WORD):
                    @pl.when((words[w] >> g) & 1 > 0)
                    def _(w=w, g=g):
                        ax, ay, bx, by, cx, cy, valid = _face_group(face_ref, w, g)
                        d, _ = _signed_distance(px, py, ax, ay, bx, by, cx, cy)
                        contrib = valid * jax.nn.softplus(-d * inv_sigma)
                        S_ref[:] += jnp.sum(contrib, axis=0, keepdims=True)[None, None]


def _fwd_pallas(face_data, tile_mask_flat, H, W, sigma, interpret=False):
    N, n_chunks = face_data.shape[0], face_data.shape[1]
    n_ty, n_tx = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    n_tiles = n_ty * n_tx
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, FACE_CHUNK, 8), lambda f, t, c, m: (f, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE_PIX), lambda f, t, c, m: (f, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    S_tiles = pl.pallas_call(
        functools.partial(
            _fwd_kernel, H=H, W=W, n_tx=n_tx, n_tiles=n_tiles, n_chunks=n_chunks,
            inv_sigma=1.0 / sigma,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, n_tiles, 1, TILE_PIX), face_data.dtype),
        cost_estimate=pl.CostEstimate(
            flops=N * n_tiles * n_chunks * FACE_CHUNK * TILE_PIX // 8,
            bytes_accessed=N * (n_tiles * TILE_PIX * 4 + n_chunks * FACE_CHUNK * 8 * 4),
            transcendentals=N * n_tiles * n_chunks * FACE_CHUNK * TILE_PIX // 64,
        ),
        interpret=interpret,
    )(tile_mask_flat, face_data)
    S = S_tiles.reshape(N, n_ty, n_tx, TILE_H, TILE_W).transpose(0, 1, 3, 2, 4).reshape(
        N, n_ty * TILE_H, n_tx * TILE_W
    )
    return S[:, :H, :W]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(mask_ref, face_ref, g_ref, dface_ref, *, H, W, n_tx, n_tiles, n_chunks, inv_sigma):
    f = pl.program_id(0)
    c = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        dface_ref[:] = jnp.zeros_like(dface_ref)

    base = ((f * n_tiles + t) * n_chunks + c) * N_WORDS
    words = [mask_ref[base + w] for w in range(N_WORDS)]
    any_bits = functools.reduce(lambda a, b: a | b, words)

    @pl.when(any_bits > 0)
    def _():
        # gS already carries the e^{−S} factor from alpha = 1 − e^{−S}:
        # saturated (or loss-untouched) tiles have exactly-zero f32 gradient
        # everywhere and skip their whole depth stack; checked only on
        # bitmask-active programs
        @pl.when(jnp.max(jnp.abs(g_ref[...])) > 1e-12)
        def _():
            _bwd_tile_body(mask_ref, face_ref, g_ref, dface_ref, words, t,
                           n_tx=n_tx, H=H, W=W, inv_sigma=inv_sigma)


def _bwd_tile_body(mask_ref, face_ref, g_ref, dface_ref, words, t, *, n_tx, H, W, inv_sigma):
    px, py = _pixel_coords(t, n_tx, H, W, g_ref.dtype)
    G = g_ref[0, 0]  # (1, TILE_PIX)

    for w in range(N_WORDS):
        for g in range(GROUPS_PER_WORD):
            @pl.when((words[w] >> g) & 1 > 0)
            def _(w=w, g=g):
                ax, ay, bx, by, cx, cy, valid = _face_group(face_ref, w, g)
                d, aux = _signed_distance(px, py, ax, ay, bx, by, cx, cy)
                (d1, t1, r1x, r1y, d2, t2, r2x, r2y, d3, t3, r3x, r3y, dmin, sign) = aux

                # dS/d(d_signed) = −sigmoid(−d/σ)/σ; chain with sign for dmin
                wgt = G * valid * jax.nn.sigmoid(-d * inv_sigma) * (-inv_sigma) * sign

                e1 = jnp.logical_and(d1 <= d2, d1 <= d3)
                e2 = jnp.logical_and(~e1, d2 <= d3)
                e3 = jnp.logical_and(~e1, ~e2)
                f1 = jnp.where(e1, wgt, 0.0)
                f2 = jnp.where(e2, wgt, 0.0)
                f3 = jnp.where(e3, wgt, 0.0)

                # point-segment grads at optimal t (envelope): r = p−u−t(v−u)
                # ∂d/∂u = −2(1−t)r ; ∂d/∂v = −2t·r — reduce over the 1024 pixels
                def rsum(x):
                    return jnp.sum(x, axis=1, keepdims=True)  # (8, 1)

                gax = rsum(f1 * (-2.0) * (1.0 - t1) * r1x + f3 * (-2.0) * t3 * r3x)
                gay = rsum(f1 * (-2.0) * (1.0 - t1) * r1y + f3 * (-2.0) * t3 * r3y)
                gbx = rsum(f1 * (-2.0) * t1 * r1x + f2 * (-2.0) * (1.0 - t2) * r2x)
                gby = rsum(f1 * (-2.0) * t1 * r1y + f2 * (-2.0) * (1.0 - t2) * r2y)
                gcx = rsum(f2 * (-2.0) * t2 * r2x + f3 * (-2.0) * (1.0 - t3) * r3x)
                gcy = rsum(f2 * (-2.0) * t2 * r2y + f3 * (-2.0) * (1.0 - t3) * r3y)
                grad8 = jnp.concatenate(
                    [gax, gay, gbx, gby, gcx, gcy, jnp.zeros_like(gax), jnp.zeros_like(gax)],
                    axis=1,
                )  # (8, 8) — attrs in columns, zero for valid/pad slots
                base_f = w * WORD + g * FACE_GROUP
                dface_ref[0, 0, base_f:base_f + FACE_GROUP, :] += grad8


def _bwd_pallas(face_data, tile_mask_flat, gS, H, W, sigma, interpret=False):
    N, n_chunks = face_data.shape[0], face_data.shape[1]
    n_ty, n_tx = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    n_tiles = n_ty * n_tx
    Hp, Wp = n_ty * TILE_H, n_tx * TILE_W
    gS_pad = jnp.zeros((N, Hp, Wp), gS.dtype).at[:, :H, :W].set(gS)
    gS_tiles = gS_pad.reshape(N, n_ty, TILE_H, n_tx, TILE_W).transpose(0, 1, 3, 2, 4).reshape(
        N, n_tiles, 1, TILE_PIX
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_chunks, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, FACE_CHUNK, 8), lambda f, c, t, m: (f, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TILE_PIX), lambda f, c, t, m: (f, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, FACE_CHUNK, 8), lambda f, c, t, m: (f, c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dface = pl.pallas_call(
        functools.partial(
            _bwd_kernel, H=H, W=W, n_tx=n_tx, n_tiles=n_tiles, n_chunks=n_chunks,
            inv_sigma=1.0 / sigma,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(face_data.shape, face_data.dtype),
        interpret=interpret,
    )(tile_mask_flat, face_data, gS_tiles)
    return dface


# ---------------------------------------------------------------------------
# packing + cull mask (plain JAX)
# ---------------------------------------------------------------------------


def _pack_faces(tri_xy: jnp.ndarray, valid: jnp.ndarray):
    """(N, F, 3, 2) triangles + (N, F) validity → (N, C, FACE_CHUNK, 8) chunks."""
    N, F = tri_xy.shape[0], tri_xy.shape[1]
    pad = (-F) % FACE_CHUNK
    flat = jnp.concatenate(
        [
            tri_xy.reshape(N, F, 6),
            valid.astype(tri_xy.dtype)[..., None],
            jnp.zeros((N, F, 1), tri_xy.dtype),
        ],
        axis=-1,
    )  # (N, F, 8)
    flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    return flat.reshape(N, -1, FACE_CHUNK, 8)


def _tile_cull_mask(tri_xy, valid, H, W, sigma):
    """(N · n_tiles · n_chunks · N_WORDS,) int32 cull words: bit g of word
    (f, t, c, w) set ⇔ 8-face subgroup g of word w of chunk c touches tile t
    (+blur margin) in frame f. Culling is hierarchical: the kernel skips a
    whole 512-face chunk when all 4 words are 0 and individual 8-face
    subgroups otherwise. Spatially-sorted faces (ModelSpec loader) make
    subgroup bboxes tight."""
    N, F = tri_xy.shape[0], tri_xy.shape[1]
    pad = (-F) % FACE_CHUNK
    big = jnp.asarray(1e9, tri_xy.dtype)
    x = tri_xy[..., 0]
    y = tri_xy[..., 1]
    xmin = jnp.where(valid, x.min(axis=-1), big)
    xmax = jnp.where(valid, x.max(axis=-1), -big)
    ymin = jnp.where(valid, y.min(axis=-1), big)
    ymax = jnp.where(valid, y.max(axis=-1), -big)

    def group_min(v):
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=1e9)
        return v.reshape(N, -1, FACE_GROUP).min(axis=-1)

    def group_max(v):
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-1e9)
        return v.reshape(N, -1, FACE_GROUP).max(axis=-1)

    gxmin, gxmax = group_min(xmin), group_max(xmax)  # (N, n_groups)
    gymin, gymax = group_min(ymin), group_max(ymax)

    margin = math.sqrt(CULL_MARGIN_SQ_SIGMAS * sigma)
    s = float(min(H, W))
    n_ty, n_tx = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    i = jnp.arange(n_ty, dtype=tri_xy.dtype)
    j = jnp.arange(n_tx, dtype=tri_xy.dtype)
    # NDC y decreases with pixel row, x decreases with pixel col
    tile_ymax = -(i * TILE_H * 2.0 + 1.0 - H) / s
    tile_ymin = -(((i + 1) * TILE_H - 1) * 2.0 + 1.0 - H) / s
    tile_xmax = -(j * TILE_W * 2.0 + 1.0 - W) / s
    tile_xmin = -(((j + 1) * TILE_W - 1) * 2.0 + 1.0 - W) / s

    # (N, n_ty, groups) / (N, n_tx, groups)
    oy = (gymin[:, None, :] <= tile_ymax[None, :, None] + margin) & (
        gymax[:, None, :] >= tile_ymin[None, :, None] - margin
    )
    ox = (gxmin[:, None, :] <= tile_xmax[None, :, None] + margin) & (
        gxmax[:, None, :] >= tile_xmin[None, :, None] - margin
    )
    hit = (oy[:, :, None, :] & ox[:, None, :, :]).reshape(
        N, n_ty * n_tx, -1, N_WORDS, GROUPS_PER_WORD
    )  # (N, T, C, W, G)
    bits = jnp.sum(
        hit.astype(jnp.int32)
        << jnp.arange(GROUPS_PER_WORD, dtype=jnp.int32)[None, None, None, None, :],
        axis=-1,
    )
    return bits.reshape(-1)


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


def _max_frames_per_call(F, H, W):
    """Largest frame sub-batch whose cull mask fits the SMEM budget."""
    n_chunks = _cdiv(F, FACE_CHUNK)
    n_tiles = _cdiv(H, TILE_H) * _cdiv(W, TILE_W)
    per_frame = n_tiles * n_chunks * N_WORDS * 4
    return max(1, SMEM_MASK_BUDGET_BYTES // per_frame)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _raster_S(tri_xy, valid, image_size, sigma, interpret=False):
    S, _ = _raster_S_fwd(tri_xy, valid, image_size, sigma, interpret)
    return S


def _raster_S_fwd(tri_xy, valid, image_size, sigma, interpret=False):
    H, W = image_size
    N, F = tri_xy.shape[0], tri_xy.shape[1]
    nb = _max_frames_per_call(F, H, W)
    outs, residuals = [], []
    for lo in range(0, N, nb):
        t, v = tri_xy[lo:lo + nb], valid[lo:lo + nb]
        face_data = _pack_faces(t, v)
        mask = _tile_cull_mask(t, v, H, W, sigma)
        outs.append(_fwd_pallas(face_data, mask, H, W, sigma, interpret=interpret))
        residuals.append((face_data, mask))
    S = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    # packed faces + cull masks are cheap to keep (~2 MB at window 10) and
    # save recomputing both in the backward pass (tri_xy rides along so the
    # bwd can read the true F from its static shape)
    return S, (residuals, tri_xy)


def _raster_S_bwd(image_size, sigma, interpret, res, gS):
    residuals, tri_xy = res
    F = tri_xy.shape[1]
    H, W = image_size
    grads, lo = [], 0
    for face_data, mask in residuals:
        n = face_data.shape[0]
        dface = _bwd_pallas(face_data, mask, gS[lo:lo + n], H, W, sigma, interpret=interpret)
        grads.append(dface.reshape(n, -1, 8)[:, :F, :6])
        lo += n
    dflat = grads[0] if len(grads) == 1 else jnp.concatenate(grads, axis=0)
    N = dflat.shape[0]
    return dflat.reshape(N, F, 3, 2), None


_raster_S.defvjp(_raster_S_fwd, _raster_S_bwd)


def auto_approx_max_faces(image_size) -> int | None:
    """The measured default work-list cap for fitting CLIs (None = exact).

    IoU-gated against the exact all-faces raster on the real model
    (tests/test_rasterizer.py::test_worklist_cap_iou_delta): cap 800 at 512²
    → IoU 0.992, resolution-scaled cap at 128² → IoU 0.999. The cap scales
    with 1/resolution because a 32×32 tile covers a larger image fraction at
    low res (measured max subgroups/tile: 321 at 128² vs 156 at 512²). The
    reference itself truncates far harder — 100 z-nearest faces per *pixel*
    (p3d_renderer.py:47) — so the capped mode is still reference-faithful.

    Off-TPU returns None: the work-list kernel would run in interpret mode
    there, which is far slower than the exact oracle — the cap is a TPU
    performance lever, not a semantics switch.
    """
    if jax.default_backend() != "tpu":
        return None
    size = max(tuple(image_size))
    if size < 128:
        return None  # tiny images: per-tile counts ≈ F, a cap buys nothing
    return max(800, int(800 * 512 / size))


def soft_silhouette(
    verts_ndc: jnp.ndarray,
    faces: jnp.ndarray,
    image_size,
    sigma: float = SIGMA,
    znear: float = 0.0,
    use_pallas: bool | None = None,
    interpret: bool = False,
    approx_max_faces: int | None = None,
) -> jnp.ndarray:
    """Soft silhouette from NDC vertices; alpha in [0, 1].

    Accepts one frame ``(V, 3)`` → ``(H, W)`` or a frame batch ``(N, V, 3)``
    → ``(N, H, W)``. Frame batches run as a native grid axis of the Pallas
    kernel (amortizing grid overhead) rather than an outer vmap.

    ``use_pallas=None`` auto-selects: Pallas kernel on TPU, pure-JAX oracle
    elsewhere. Differentiable wrt ``verts_ndc`` either way.

    ``approx_max_faces`` opts into the work-list kernel
    (:mod:`rasterizer_worklist`): per 32x32 tile, only the z-nearest
    ``approx_max_faces`` overlapping faces are rasterized — the
    reference-faithful approximation (PyTorch3D keeps the 100 z-nearest faces
    per pixel, ``p3d_renderer.py:47``). None = exact all-faces SoftRas.
    """
    if approx_max_faces is not None:
        # the cap is implemented BY the work-list Pallas kernel; honoring it on
        # the reference path would silently return the exact raster instead
        # (results mis-attributed to the approximate mode). On non-TPU backends
        # the kernel runs in interpret mode, so the approximation semantics —
        # not just the API — are identical everywhere.
        if use_pallas is False:
            raise ValueError(
                "approx_max_faces requires the Pallas work-list kernel; it "
                "cannot be combined with use_pallas=False (the pure-JAX "
                "reference raster is exact-only)")
        use_pallas = True
        interpret = interpret or jax.default_backend() != "tpu"
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    batched = verts_ndc.ndim == 3
    if not use_pallas:
        if batched:
            return jax.vmap(
                lambda v: soft_silhouette_ref(v, faces, image_size, sigma=sigma, znear=znear)
            )(verts_ndc)
        return soft_silhouette_ref(verts_ndc, faces, image_size, sigma=sigma, znear=znear)

    vb = verts_ndc if batched else verts_ndc[None]
    tri = vb[:, faces]  # (N, F, 3, 3)
    valid = jnp.any(tri[..., 2] > znear, axis=-1)
    if approx_max_faces is not None:
        from smilify_tpu.render.rasterizer_worklist import raster_S_worklist

        k_sub = max(1, _cdiv(approx_max_faces, FACE_GROUP))
        S = raster_S_worklist(tri[..., :2], tri[..., 2], valid,
                              tuple(image_size), sigma, k_sub, interpret)
    else:
        S = _raster_S(tri[..., :2], valid, tuple(image_size), sigma, interpret)
    alpha = 1.0 - jnp.exp(-S)
    return alpha if batched else alpha[0]
