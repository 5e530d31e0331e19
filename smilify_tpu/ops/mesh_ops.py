"""Mesh losses and sampling — TPU-native replacements for the PyTorch3D ops the
reference's 3D registration uses (``fitter_3d/trainer.py:3-9,371-435``):
chamfer_distance, mesh_edge_loss, mesh_laplacian_smoothing (uniform),
mesh_normal_consistency, sample_points_from_meshes.

All functions are pure, jit/vmap/grad-compatible; topology-derived index
arrays (edges, adjacency) are computed host-side once per mesh topology via
the ``*_from_faces`` helpers and passed in as static data.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from smilify_tpu.ops.knn import knn_points

HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# topology helpers (host, numpy)
# ---------------------------------------------------------------------------


def edges_from_faces(faces: np.ndarray) -> np.ndarray:
    """(F, 3) → unique undirected edges (E, 2), sorted pairs."""
    f = np.asarray(faces)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def laplacian_neighbors_from_faces(faces: np.ndarray, n_verts: int, max_degree: int = 16):
    """Uniform-Laplacian neighbor table: (V, max_degree) int32 + (V,) degree."""
    nbrs = [[] for _ in range(n_verts)]
    for a, b in edges_from_faces(faces):
        nbrs[a].append(b)
        nbrs[b].append(a)
    deg = np.array([len(n) for n in nbrs], dtype=np.int32)
    md = int(max(max_degree, deg.max() if len(deg) else 1))
    table = np.zeros((n_verts, md), dtype=np.int32)
    for i, n in enumerate(nbrs):
        table[i, : len(n)] = n
    return table, deg


def face_adjacency_from_faces(faces: np.ndarray):
    """Pairs of faces sharing an edge, with their opposite vertices.

    Returns (P, 4) int32 rows [v_shared0, v_shared1, v_opp_a, v_opp_b] for the
    normal-consistency loss.
    """
    f = np.asarray(faces)
    edge_map = {}
    pairs = []
    for fi, tri in enumerate(f):
        for k in range(3):
            a, b = int(tri[k]), int(tri[(k + 1) % 3])
            opp = int(tri[(k + 2) % 3])
            key = (min(a, b), max(a, b))
            if key in edge_map:
                (a0, b0, opp0) = edge_map[key]
                pairs.append([key[0], key[1], opp0, opp])
            else:
                edge_map[key] = (a, b, opp)
    if not pairs:
        return np.zeros((0, 4), dtype=np.int32)
    return np.asarray(pairs, dtype=np.int32)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric mean squared chamfer distance between point sets.

    Matches pytorch3d.loss.chamfer_distance defaults (mean over points, sum of
    the two directions). Supports (N, 3)/(M, 3) or batched (B, N, 3).
    """
    if x.ndim == 3:
        in_axes = (0, 0, 0 if x_mask is not None else None, 0 if y_mask is not None else None)
        per_batch = jax.vmap(chamfer_distance, in_axes=in_axes)(x, y, x_mask, y_mask)
        return jnp.mean(per_batch)
    d_xy = knn_points(x, y, K=1, x_mask=x_mask, y_mask=y_mask).dists[:, 0]
    d_yx = knn_points(y, x, K=1, x_mask=y_mask, y_mask=x_mask).dists[:, 0]
    if x_mask is not None:
        mx = x_mask.astype(x.dtype)
        term_x = jnp.sum(d_xy * mx) / jnp.maximum(jnp.sum(mx), 1.0)
    else:
        term_x = jnp.mean(d_xy)
    if y_mask is not None:
        my = y_mask.astype(y.dtype)
        term_y = jnp.sum(d_yx * my) / jnp.maximum(jnp.sum(my), 1.0)
    else:
        term_y = jnp.mean(d_yx)
    return term_x + term_y


def mesh_edge_loss(verts: jnp.ndarray, edges: jnp.ndarray, target_length: float = 0.0) -> jnp.ndarray:
    """Mean squared deviation of edge lengths from target (pytorch3d semantics)."""
    v0 = verts[..., edges[:, 0], :]
    v1 = verts[..., edges[:, 1], :]
    lengths = jnp.linalg.norm(v0 - v1, axis=-1)
    return jnp.mean((lengths - target_length) ** 2)


def mesh_laplacian_smoothing(
    verts: jnp.ndarray, nbr_table: jnp.ndarray, degree: jnp.ndarray
) -> jnp.ndarray:
    """Uniform Laplacian smoothing: mean ‖L·v‖ (pytorch3d method='uniform')."""
    nbrs = verts[..., nbr_table, :]  # (..., V, max_deg, 3)
    md = nbr_table.shape[-1]
    mask = (jnp.arange(md)[None, :] < degree[:, None]).astype(verts.dtype)
    mean_nbr = jnp.sum(nbrs * mask[..., None], axis=-2) / jnp.maximum(degree[:, None], 1.0)
    lap = mean_nbr - verts
    lap = jnp.where(degree[:, None] > 0, lap, 0.0)
    return jnp.mean(jnp.linalg.norm(lap, axis=-1))


def mesh_normal_consistency(verts: jnp.ndarray, adjacency: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 − cos) between normals of edge-adjacent faces (pytorch3d form).

    ``adjacency`` rows are [shared0, shared1, opp_a, opp_b] from
    :func:`face_adjacency_from_faces`.
    """
    if adjacency.shape[0] == 0:
        return jnp.asarray(0.0, dtype=verts.dtype)
    s0 = verts[..., adjacency[:, 0], :]
    s1 = verts[..., adjacency[:, 1], :]
    oa = verts[..., adjacency[:, 2], :]
    ob = verts[..., adjacency[:, 3], :]
    e = s1 - s0
    na = jnp.cross(e, oa - s0)
    nb = jnp.cross(ob - s0, e)  # opposite winding so aligned normals agree
    cos = jnp.sum(na * nb, axis=-1) / jnp.maximum(
        jnp.linalg.norm(na, axis=-1) * jnp.linalg.norm(nb, axis=-1), 1e-12
    )
    return jnp.mean(1.0 - cos)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


class SampledPoints(NamedTuple):
    points: jnp.ndarray    # (S, 3)
    normals: jnp.ndarray   # (S, 3)
    face_idx: jnp.ndarray  # (S,)


@partial(jax.jit, static_argnames=("num_samples", "return_normals"))
def sample_points_from_meshes(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    num_samples: int,
    key: jax.Array,
    return_normals: bool = False,
    face_mask: Optional[jnp.ndarray] = None,
):
    """Area-weighted uniform surface sampling (pytorch3d
    ``sample_points_from_meshes`` semantics) with a jax PRNG key.

    Differentiable wrt ``verts`` (face choice is detached; barycentric
    interpolation carries gradients).

    Face choice uses inverse-CDF sampling (cumsum + searchsorted) rather than
    ``jax.random.categorical``: the Gumbel-max trick materializes an
    (S × F) noise matrix — ~33M threefry values per call at the registration
    fitter's 3000×10878 — where the CDF walk needs only S uniforms. Zero-area
    (padded/degenerate) faces occupy empty CDF intervals so they are never
    selected, matching the categorical's −inf-logit behavior.
    """
    # XLA's constant-folding evaluator disagrees with the runtime lowering of
    # *batched* (vmap-derived) gathers: when verts AND faces are both jit-time
    # constants (e.g. target meshes closed over by a fitter step), the folded
    # v0/v1/v2 keep only component 0 and zero the rest, silently corrupting
    # every downstream loss (observed on CPU and TPU backends, jax 0.9.0; see
    # tests/test_ops.py::test_sampling_constant_folding_guard). The barrier
    # keeps `faces` out of the foldable constant subtree; it is index data on
    # no gradient path, so this costs nothing at runtime.
    faces = jax.lax.optimization_barrier(faces)
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    cross = jnp.cross(v1 - v0, v2 - v0)
    areas = 0.5 * jnp.linalg.norm(cross, axis=-1)
    if face_mask is not None:
        # explicit exclusion of padded faces (empty CDF intervals), independent
        # of whether the padding happens to be geometrically degenerate
        areas = areas * face_mask.astype(areas.dtype)
    probs = areas / jnp.maximum(areas.sum(), 1e-12)

    k1, k2 = jax.random.split(key)
    cdf = jnp.cumsum(jax.lax.stop_gradient(probs))
    r = jax.random.uniform(k1, (num_samples,)) * cdf[-1]
    # side="right" assigns face i the half-open interval [cdf[i-1], cdf[i]):
    # zero-area faces have EMPTY intervals and are unselectable even when r
    # lands exactly on a CDF boundary (r=0.0 with a degenerate face 0 would,
    # under side="left", select that face).
    fidx = jnp.clip(jnp.searchsorted(cdf, r, side="right"), 0, faces.shape[0] - 1)
    u = jax.random.uniform(k2, (num_samples, 2))
    su = jnp.sqrt(u[:, 0:1])
    w0 = 1.0 - su
    w1 = su * (1.0 - u[:, 1:2])
    w2 = su * u[:, 1:2]
    pts = w0 * v0[fidx] + w1 * v1[fidx] + w2 * v2[fidx]
    if not return_normals:
        return pts
    n = cross / jnp.maximum(jnp.linalg.norm(cross, axis=-1, keepdims=True), 1e-12)
    return SampledPoints(points=pts, normals=n[fidx], face_idx=fidx)


@partial(jax.jit, static_argnames=("n_neighbors",))
def compute_thinness_scores(verts: jnp.ndarray, faces: jnp.ndarray,
                            n_neighbors: int = 50) -> jnp.ndarray:
    """Per-face 'thinness' score: normal-direction variation among the
    n_neighbors nearest face centers (reference
    ``fitter_3d/utils.py:361`` compute_thinness_scores). High variation marks
    thin / high-curvature regions; used to weight registration losses.

    score_f = 1 − mean_k |n_f · n_k| over the K nearest neighbor faces
    (absolute dot: opposing normals across a thin wall count as variation in
    the reference's sense of thinness).

    Accepts (V, 3)/(F, 3) or batched (B, V, 3) with shared faces.
    """
    from smilify_tpu.ops.knn import knn_points

    if verts.ndim == 3:
        return jax.vmap(lambda v: compute_thinness_scores(v, faces, n_neighbors))(verts)

    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    centers = (v0 + v1 + v2) / 3.0
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    K = min(n_neighbors + 1, centers.shape[0])   # +1: nearest neighbor is self
    res = knn_points(centers, centers, K=K)
    nn_idx = res.idx[:, 1:]                  # drop self
    dots = jnp.abs(jnp.sum(n[nn_idx] * n[:, None, :], axis=-1))
    return 1.0 - jnp.mean(dots, axis=-1)
