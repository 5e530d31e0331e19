"""K-nearest-neighbor search between point clouds — TPU-native.

Replaces PyTorch3D's CUDA ``knn_points`` (used by the reference's chamfer and
SDF losses, ``fitter_3d/trainer.py:3-9`` / ``fitter_3d/utils.py:1016``).

Strategy: the pairwise squared-distance matrix is pure MXU work —
‖x−y‖² = ‖x‖² + ‖y‖² − 2⟨x, y⟩ — evaluated in query tiles so memory stays
O(tile × M), followed by ``lax.top_k`` on the negated distances. Exact
(not approximate), differentiable through the distances via gather.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


class KNNResult(NamedTuple):
    dists: jnp.ndarray  # (..., N, K) squared distances, ascending
    idx: jnp.ndarray    # (..., N, K) int32 neighbor indices into y
    knn: jnp.ndarray    # (..., N, K, D) gathered neighbor points


@partial(jax.jit, static_argnames=("K", "tile"))
def knn_points(
    x: jnp.ndarray,
    y: jnp.ndarray,
    K: int = 1,
    x_mask: jnp.ndarray | None = None,
    y_mask: jnp.ndarray | None = None,
    tile: int = 1024,
) -> KNNResult:
    """K nearest neighbors in ``y`` for each point of ``x``.

    Args:
      x: (N, D) query points (or (B, N, D); batched via vmap internally).
      y: (M, D) reference points (or (B, M, D)).
      K: number of neighbors.
      x_mask / y_mask: optional validity masks ((N,) / (M,)); invalid y points
        are pushed to +inf distance, invalid x rows return zeros.
      tile: query rows per distance-matrix tile.

    Returns :class:`KNNResult` (squared distances, ascending).
    """
    if x.ndim == 3:
        fn = jax.vmap(lambda xb, yb: knn_points(xb, yb, K=K, tile=tile))
        return fn(x, y)

    N, D = x.shape
    M = y.shape[0]
    y_sq = jnp.sum(y * y, axis=-1)  # (M,)
    if y_mask is not None:
        y_sq = jnp.where(y_mask, y_sq, jnp.inf)

    pad = (-N) % tile
    x_p = jnp.pad(x, ((0, pad), (0, 0)))
    n_tiles = x_p.shape[0] // tile
    x_t = x_p.reshape(n_tiles, tile, D)

    def body(xt):
        d = (
            jnp.sum(xt * xt, axis=-1, keepdims=True)
            + y_sq[None, :]
            - 2.0 * jnp.matmul(xt, y.T, precision=HIGHEST)
        )  # (tile, M)
        d = jnp.maximum(d, 0.0) + jnp.where(jnp.isinf(y_sq)[None, :], jnp.inf, 0.0)
        neg_top, idx = jax.lax.top_k(-d, K)
        return -neg_top, idx.astype(jnp.int32)

    dists, idx = jax.lax.map(body, x_t)
    dists = dists.reshape(-1, K)[:N]
    idx = idx.reshape(-1, K)[:N]
    if x_mask is not None:
        dists = jnp.where(x_mask[:, None], dists, 0.0)
        idx = jnp.where(x_mask[:, None], idx, 0)
    return KNNResult(dists=dists, idx=idx, knn=y[idx])
