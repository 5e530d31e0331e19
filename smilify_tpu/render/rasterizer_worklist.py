"""Work-list soft-silhouette kernels — the opt-in fast path.

The exact kernel (:mod:`rasterizer`) runs a (frames, tiles, chunks) grid and
skips non-overlapping work via a bitmask; the ~30k mostly-culled programs at
window 10 still cost ~5 ms of the ~30 ms step, and every pixel pays for the
full depth stack of its tile.

This module instead precomputes, per 32x32 pixel tile, a **work list** of the
8-face subgroups whose bbox (+blur margin) touches the tile, sorted by
nearest-z and capped at ``max_faces`` — the reference-faithful approximation:
PyTorch3D's rasterizer keeps only the ``faces_per_pixel=100`` z-nearest faces
per pixel (``p3d_renderer.py:47``), so a z-sorted per-tile cap drops the same
far-face tails. The kernel grid is just (frames, tiles); each program walks
its list with a dynamic-trip-count ``fori_loop`` (zero wasted programs, zero
wasted subgroup iterations) fetching face subgroups by dynamic VMEM slice.

With ``max_faces`` large enough to never truncate, the result is bit-exact
with the exact kernel's work (same subgroups, same math) — the IoU-delta test
in tests/test_rasterizer.py pins the approximation error of the default cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smilify_tpu.render.rasterizer import (
    CULL_MARGIN_SQ_SIGMAS,
    FACE_GROUP,
    SATURATION_S,
    SMEM_MASK_BUDGET_BYTES,
    TILE_H,
    TILE_PIX,
    TILE_W,
    _cdiv,
    _pixel_coords,
    _signed_distance,
)

import math


def _pack_faces_flat(tri_xy: jnp.ndarray, valid: jnp.ndarray):
    """(N, F, 3, 2) + (N, F) → (N, F_pad, 8) with F_pad a FACE_GROUP multiple."""
    N, F = tri_xy.shape[0], tri_xy.shape[1]
    pad = (-F) % FACE_GROUP
    flat = jnp.concatenate(
        [
            tri_xy.reshape(N, F, 6),
            valid.astype(tri_xy.dtype)[..., None],
            jnp.zeros((N, F, 1), tri_xy.dtype),
        ],
        axis=-1,
    )
    return jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))


def _tile_worklists(tri_xy, tri_z, valid, H, W, sigma, k_sub: int):
    """Per-tile subgroup work lists, nearest-z first.

    Returns (idx, count): idx (N, T, k_sub) int32 subgroup ids (garbage past
    count), count (N, T) int32 number of valid entries (pre-cap overlaps
    clipped to k_sub).
    """
    N, F = tri_xy.shape[0], tri_xy.shape[1]
    pad = (-F) % FACE_GROUP
    x = tri_xy[..., 0]
    y = tri_xy[..., 1]
    big = jnp.asarray(1e9, tri_xy.dtype)
    xmin = jnp.where(valid, x.min(axis=-1), big)
    xmax = jnp.where(valid, x.max(axis=-1), -big)
    ymin = jnp.where(valid, y.min(axis=-1), big)
    ymax = jnp.where(valid, y.max(axis=-1), -big)
    zmin = jnp.where(valid, tri_z.min(axis=-1), big)

    def gmin(v, fill=1e9):
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=fill)
        return v.reshape(N, -1, FACE_GROUP).min(axis=-1)

    def gmax(v):
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-1e9)
        return v.reshape(N, -1, FACE_GROUP).max(axis=-1)

    gxmin, gxmax = gmin(xmin), gmax(xmax)
    gymin, gymax = gmin(ymin), gmax(ymax)
    gz = gmin(zmin)  # (N, G) nearest z per subgroup

    margin = math.sqrt(CULL_MARGIN_SQ_SIGMAS * sigma)
    s = float(min(H, W))
    n_ty, n_tx = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    i = jnp.arange(n_ty, dtype=tri_xy.dtype)
    j = jnp.arange(n_tx, dtype=tri_xy.dtype)
    tile_ymax = -(i * TILE_H * 2.0 + 1.0 - H) / s
    tile_ymin = -(((i + 1) * TILE_H - 1) * 2.0 + 1.0 - H) / s
    tile_xmax = -(j * TILE_W * 2.0 + 1.0 - W) / s
    tile_xmin = -(((j + 1) * TILE_W - 1) * 2.0 + 1.0 - W) / s

    oy = (gymin[:, None, :] <= tile_ymax[None, :, None] + margin) & (
        gymax[:, None, :] >= tile_ymin[None, :, None] - margin
    )
    ox = (gxmin[:, None, :] <= tile_xmax[None, :, None] + margin) & (
        gxmax[:, None, :] >= tile_xmin[None, :, None] - margin
    )
    overlap = (oy[:, :, None, :] & ox[:, None, :, :]).reshape(N, n_ty * n_tx, -1)

    # nearest-z-first ordering: top_k over −z with non-overlapping groups at
    # +inf keys; finite keys sort to the front, so `count` bounds the walk
    key = jnp.where(overlap, -gz[:, None, :], -jnp.inf)
    k = min(k_sub, overlap.shape[-1])
    _, idx = jax.lax.top_k(key, k)                       # (N, T, k)
    if k < k_sub:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, k_sub - k)))
    count = jnp.minimum(overlap.sum(axis=-1), k).astype(jnp.int32)
    return idx.astype(jnp.int32), count


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _attrs(fa):
    """(8, 8) face rows → seven (8, 1) attribute columns."""
    return (fa[:, 0:1], fa[:, 1:2], fa[:, 2:3], fa[:, 3:4],
            fa[:, 4:5], fa[:, 5:6], fa[:, 6:7])


def _wl_fwd_kernel(wl_ref, face_ref, S_ref, *, H, W, n_tx, n_tiles, k_sub, inv_sigma):
    f = pl.program_id(0)
    t = pl.program_id(1)
    S_ref[:] = jnp.zeros_like(S_ref)

    base = (f * n_tiles + t) * (k_sub + 1)
    count = wl_ref[base]
    px, py = _pixel_coords(t, n_tx, H, W, S_ref.dtype)

    def body(k, _):
        # saturation early-out: once every pixel has S > 20, later (farther —
        # the list is z-sorted) subgroups cannot change alpha
        @pl.when(jnp.min(S_ref[...]) < SATURATION_S)
        def _():
            idx = wl_ref[base + 1 + k]
            fa = face_ref[0, 0, pl.ds(idx * FACE_GROUP, FACE_GROUP), :]
            ax, ay, bx, by, cx, cy, valid = _attrs(fa)
            d, _ = _signed_distance(px, py, ax, ay, bx, by, cx, cy)
            contrib = valid * jax.nn.softplus(-d * inv_sigma)
            S_ref[:] += jnp.sum(contrib, axis=0, keepdims=True)[None, None]
        return 0

    jax.lax.fori_loop(0, count, body, 0)


def _wl_bwd_kernel(wl_ref, face_ref, g_ref, dface_ref, *, H, W, n_tx, n_tiles, k_sub, inv_sigma):
    f = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dface_ref[:] = jnp.zeros_like(dface_ref)

    base = (f * n_tiles + t) * (k_sub + 1)
    count = wl_ref[base]
    G = g_ref[0, 0]  # (1, TILE_PIX)

    @pl.when(jnp.max(jnp.abs(G)) > 1e-12)
    def _():
        px, py = _pixel_coords(t, n_tx, H, W, g_ref.dtype)

        def body(k, _):
            idx = wl_ref[base + 1 + k]
            start = idx * FACE_GROUP
            fa = face_ref[0, 0, pl.ds(start, FACE_GROUP), :]
            ax, ay, bx, by, cx, cy, valid = _attrs(fa)
            d, aux = _signed_distance(px, py, ax, ay, bx, by, cx, cy)
            (d1, t1, r1x, r1y, d2, t2, r2x, r2y, d3, t3, r3x, r3y, dmin, sign) = aux
            wgt = G * valid * jax.nn.sigmoid(-d * inv_sigma) * (-inv_sigma) * sign

            e1 = jnp.logical_and(d1 <= d2, d1 <= d3)
            e2 = jnp.logical_and(~e1, d2 <= d3)
            e3 = jnp.logical_and(~e1, ~e2)
            f1 = jnp.where(e1, wgt, 0.0)
            f2 = jnp.where(e2, wgt, 0.0)
            f3 = jnp.where(e3, wgt, 0.0)

            def rsum(v):
                return jnp.sum(v, axis=1, keepdims=True)

            gax = rsum(f1 * (-2.0) * (1.0 - t1) * r1x + f3 * (-2.0) * t3 * r3x)
            gay = rsum(f1 * (-2.0) * (1.0 - t1) * r1y + f3 * (-2.0) * t3 * r3y)
            gbx = rsum(f1 * (-2.0) * t1 * r1x + f2 * (-2.0) * (1.0 - t2) * r2x)
            gby = rsum(f1 * (-2.0) * t1 * r1y + f2 * (-2.0) * (1.0 - t2) * r2y)
            gcx = rsum(f2 * (-2.0) * t2 * r2x + f3 * (-2.0) * (1.0 - t3) * r3x)
            gcy = rsum(f2 * (-2.0) * t2 * r2y + f3 * (-2.0) * (1.0 - t3) * r3y)
            grad8 = jnp.concatenate(
                [gax, gay, gbx, gby, gcx, gcy, jnp.zeros_like(gax), jnp.zeros_like(gax)],
                axis=1,
            )
            cur = dface_ref[0, 0, pl.ds(start, FACE_GROUP), :]
            dface_ref[0, 0, pl.ds(start, FACE_GROUP), :] = cur + grad8
            return 0

        jax.lax.fori_loop(0, count, body, 0)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _frames_per_call(H, W, k_sub):
    n_tiles = _cdiv(H, TILE_H) * _cdiv(W, TILE_W)
    per_frame = n_tiles * (k_sub + 1) * 4
    return max(1, SMEM_MASK_BUDGET_BYTES // per_frame)


def _flatten_worklist(idx, count):
    """(N, T, k) + (N, T) → flat SMEM words [count, idx_0..idx_{k-1}] per tile."""
    N, T, k = idx.shape
    return jnp.concatenate([count[..., None], idx], axis=-1).reshape(-1)


def _wl_fwd(face_flat, wl, H, W, n_tiles, k_sub, sigma, interpret):
    N = face_flat.shape[0]
    n_ty, n_tx = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1,) + face_flat.shape[1:], lambda f, t, m: (f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE_PIX), lambda f, t, m: (f, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    S_tiles = pl.pallas_call(
        functools.partial(_wl_fwd_kernel, H=H, W=W, n_tx=n_tx, n_tiles=n_tiles,
                          k_sub=k_sub, inv_sigma=1.0 / sigma),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, n_tiles, 1, TILE_PIX), face_flat.dtype),
        interpret=interpret,
    )(wl, face_flat)
    S = S_tiles.reshape(N, n_ty, n_tx, TILE_H, TILE_W).transpose(0, 1, 3, 2, 4).reshape(
        N, n_ty * TILE_H, n_tx * TILE_W
    )
    return S[:, :H, :W]


def _wl_bwd(face_flat, wl, gS, H, W, n_tiles, k_sub, sigma, interpret):
    N = face_flat.shape[0]
    n_ty, n_tx = _cdiv(H, TILE_H), _cdiv(W, TILE_W)
    Hp, Wp = n_ty * TILE_H, n_tx * TILE_W
    gS_pad = jnp.zeros((N, Hp, Wp), gS.dtype).at[:, :H, :W].set(gS)
    gS_tiles = gS_pad.reshape(N, n_ty, TILE_H, n_tx, TILE_W).transpose(0, 1, 3, 2, 4).reshape(
        N, n_tiles, 1, TILE_PIX
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1,) + face_flat.shape[1:], lambda f, t, m: (f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TILE_PIX), lambda f, t, m: (f, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + face_flat.shape[1:], lambda f, t, m: (f, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_wl_bwd_kernel, H=H, W=W, n_tx=n_tx, n_tiles=n_tiles,
                          k_sub=k_sub, inv_sigma=1.0 / sigma),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(face_flat.shape, face_flat.dtype),
        interpret=interpret,
    )(wl, face_flat, gS_tiles)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def raster_S_worklist(tri_xy, tri_z, valid, image_size, sigma, k_sub, interpret=False):
    S, _ = _raster_wl_fwd(tri_xy, tri_z, valid, image_size, sigma, k_sub, interpret)
    return S


def _raster_wl_fwd(tri_xy, tri_z, valid, image_size, sigma, k_sub, interpret=False):
    H, W = image_size
    N, F = tri_xy.shape[0], tri_xy.shape[1]
    n_tiles = _cdiv(H, TILE_H) * _cdiv(W, TILE_W)
    nb = _frames_per_call(H, W, k_sub)
    face_flat = _pack_faces_flat(tri_xy, valid)[:, None]  # (N, 1, F_pad, 8)
    idx, count = _tile_worklists(tri_xy, tri_z, valid, H, W, sigma, k_sub)
    outs, residuals = [], []
    for lo in range(0, N, nb):
        ff = face_flat[lo:lo + nb]
        wl = _flatten_worklist(idx[lo:lo + nb], count[lo:lo + nb])
        outs.append(_wl_fwd(ff, wl, H, W, n_tiles, k_sub, sigma, interpret))
        residuals.append((ff, wl))
    S = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return S, (residuals, tri_xy)


def _raster_wl_bwd(image_size, sigma, k_sub, interpret, res, gS):
    residuals, tri_xy = res
    F = tri_xy.shape[1]
    H, W = image_size
    n_tiles = _cdiv(H, TILE_H) * _cdiv(W, TILE_W)
    grads, lo = [], 0
    for ff, wl in residuals:
        n = ff.shape[0]
        dface = _wl_bwd(ff, wl, gS[lo:lo + n], H, W, n_tiles, k_sub, sigma, interpret)
        grads.append(dface.reshape(n, -1, 8)[:, :F, :6])
        lo += n
    dflat = grads[0] if len(grads) == 1 else jnp.concatenate(grads, axis=0)
    N = dflat.shape[0]
    return dflat.reshape(N, F, 3, 2), None, None


raster_S_worklist.defvjp(_raster_wl_fwd, _raster_wl_bwd)
