"""Spatial Diameter Function (SDF): ray-cast computation + distance loss.

TPU-native equivalents of the reference's SDF pipeline:
  * :func:`compute_sdf` — per-surface-point "diameter" by casting rays into the
    mesh within a hemisphere around −normal and taking the farthest hit within
    [0.001, 0.2]·bbox_diagonal (reference ``fitter_3d/SDF_tests.py:253-384``),
    fully vectorized Möller–Trumbore over (rays × faces) instead of the
    reference's per-ray Python loop;
  * :func:`smooth_sdf` — kNN mean smoothing (``SDF_tests.py:387-416``);
  * :func:`assign_vertex_sdf` — inverse-distance-weighted kNN transfer to mesh
    vertices, min-max normalized (``SDF_tests.py:775-820``);
  * :func:`sdf_distance` — z-score-normalized, SDF-similarity-soft-weighted
    bidirectional KNN distance between point clouds
    (``fitter_3d/utils.py:973-1262``), the differentiable registration loss.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# ray casting
# ---------------------------------------------------------------------------


def ray_triangle_intersect(origins, directions, v0, v1, v2, eps: float = 1e-6):
    """Batched Möller–Trumbore: rays (R, 3) × triangles (F, 3) → t values.

    Returns (R, F) intersection distances with +inf where no hit.
    """
    e1 = v1 - v0  # (F, 3)
    e2 = v2 - v0
    h = jnp.cross(directions[:, None, :], e2[None, :, :])  # (R, F, 3)
    a = jnp.sum(e1[None] * h, axis=-1)  # (R, F)
    f = 1.0 / jnp.where(jnp.abs(a) < eps, jnp.inf, a)
    s = origins[:, None, :] - v0[None]  # (R, F, 3)
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1[None, :, :])
    v = f * jnp.sum(directions[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[None] * q, axis=-1)
    hit = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > eps)
    return jnp.where(hit, t, jnp.inf)


def hemisphere_directions(normals: jnp.ndarray, num_rays: int, key: jax.Array) -> jnp.ndarray:
    """Random unit directions in the hemisphere opposite each normal
    (reference generate_random_directions_batch, SDF_tests.py:225-251)."""
    B = normals.shape[0]
    d = jax.random.normal(key, (B, num_rays, 3))
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    dots = jnp.sum(d * (-normals[:, None, :]), axis=-1)
    return jnp.where(dots[..., None] < 0, -d, d)


@partial(jax.jit, static_argnames=("num_samples", "num_rays", "point_chunk"))
def compute_sdf(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    key: jax.Array,
    num_samples: int = 1000,
    num_rays: int = 30,
    point_chunk: int = 64,
):
    """Spatial diameter at sampled surface points.

    Returns (sample_points (N, 3), diameters (N,)). A ray's measurement is the
    farthest intersection; it is valid when inside
    (0.001, 0.2) × bbox_diagonal; a point's diameter is the mean of its valid
    rays (min threshold when none) — reference semantics, vectorized.
    """
    from smilify_tpu.ops.mesh_ops import sample_points_from_meshes

    bbox_diag = jnp.linalg.norm(verts.max(axis=0) - verts.min(axis=0))
    min_thr = bbox_diag * 0.001
    max_thr = bbox_diag * 0.2
    offset = bbox_diag * 1e-4

    k1, k2 = jax.random.split(key)
    sampled = sample_points_from_meshes(verts, faces, num_samples, k1, return_normals=True)
    pts, normals = sampled.points, sampled.normals

    dirs = hemisphere_directions(normals, num_rays, k2)  # (N, R, 3)
    origins = pts + normals * offset  # offset along +normal as in the reference

    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]

    pad = (-num_samples) % point_chunk
    o_p = jnp.pad(origins, ((0, pad), (0, 0)))
    d_p = jnp.pad(dirs, ((0, pad), (0, 0), (0, 0)))
    n_chunks = o_p.shape[0] // point_chunk

    def body(chunk_idx):
        o = jax.lax.dynamic_slice_in_dim(o_p, chunk_idx * point_chunk, point_chunk)
        dd = jax.lax.dynamic_slice_in_dim(d_p, chunk_idx * point_chunk, point_chunk)
        o_flat = jnp.repeat(o, num_rays, axis=0)
        d_flat = dd.reshape(-1, 3)
        t = ray_triangle_intersect(o_flat, d_flat, v0, v1, v2)  # (chunk·R, F)
        # farthest hit per ray, ignoring inf (no-hit)
        t_hit = jnp.where(jnp.isinf(t), -jnp.inf, t)
        t_max = jnp.max(t_hit, axis=-1)  # (chunk·R,)
        valid = (t_max > min_thr) & (t_max < max_thr)
        t_max = t_max.reshape(point_chunk, num_rays)
        valid = valid.reshape(point_chunk, num_rays)
        count = jnp.sum(valid, axis=1)
        mean_d = jnp.sum(jnp.where(valid, t_max, 0.0), axis=1) / jnp.maximum(count, 1)
        return jnp.where(count > 0, mean_d, min_thr)

    diam = jax.lax.map(body, jnp.arange(n_chunks)).reshape(-1)[:num_samples]
    return pts, diam


def smooth_sdf(points: jnp.ndarray, values: jnp.ndarray, k: int = 100) -> jnp.ndarray:
    """kNN mean smoothing of SDF values (SDF_tests.py:387-416)."""
    from smilify_tpu.ops.knn import knn_points

    k = min(k, points.shape[0])
    res = knn_points(points, points, K=k)
    return jnp.mean(values[res.idx], axis=-1)


def assign_vertex_sdf(
    verts: jnp.ndarray, sample_points: jnp.ndarray, diameters: jnp.ndarray, k: int = 10
) -> jnp.ndarray:
    """IDW kNN transfer of diameters to vertices, min-max normalized to [0, 1]."""
    from smilify_tpu.ops.knn import knn_points

    res = knn_points(verts, sample_points, K=k)
    w = 1.0 / (jnp.sqrt(jnp.maximum(res.dists, 0.0)) + 1e-6)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    v_sdf = jnp.sum(diameters[res.idx] * w, axis=-1)
    lo, hi = v_sdf.min(), v_sdf.max()
    return jnp.where(hi > lo, (v_sdf - lo) / (hi - lo), jnp.zeros_like(v_sdf))


# ---------------------------------------------------------------------------
# SDF distance loss
# ---------------------------------------------------------------------------


def _zscore(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return (v - v.mean()) / jnp.maximum(v.std(), eps)


def _sdf_distance_single(x, y, x_sdf, y_sdf, k, temperature=0.1):
    from smilify_tpu.ops.knn import knn_points

    res = knn_points(x, y, K=k)
    y_sdf_nn = y_sdf[res.idx]  # (P1, k)
    sdf_diffs = jnp.abs(x_sdf[:, None] - y_sdf_nn)
    # soft-min over neighbors by SDF similarity (differentiable argmin)
    w = jax.nn.softmax(-sdf_diffs / temperature, axis=-1)
    return jnp.mean(jnp.sum(w * res.dists, axis=-1))


def sdf_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_sdf: jnp.ndarray,
    y_sdf: jnp.ndarray,
    k: int = 8,
    single_directional: bool = False,
    normalize_sdf: bool = True,
) -> jnp.ndarray:
    """SDF-weighted bidirectional point-cloud distance (utils.py:1127-1262).

    Args are single-cloud ((P, 3) / (P,)); vmap for batches.
    """
    if normalize_sdf:
        x_sdf = _zscore(x_sdf)
        y_sdf = _zscore(y_sdf)
    fwd = _sdf_distance_single(x, y, x_sdf, y_sdf, k)
    if single_directional:
        return fwd
    return fwd + _sdf_distance_single(y, x, y_sdf, x_sdf, k)
