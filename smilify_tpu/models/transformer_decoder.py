"""IEF transformer-decoder head.

Re-design of the reference ``neuralSMIL/transformer_decoder.py:111-673``:
a single query token embeds the *current parameter estimate*; N transformer
decoder layers cross-attend the backbone's patch tokens; per-group linear
heads emit parameter *deltas* which are added to the running estimate
(Iterative Error Feedback, default 3 iterations). The initial estimate is a
learned parameter initialized so rotations start at the 6D identity.

The IEF loop is a compile-time-unrolled loop (ief_iters is small and static),
keeping everything jit-friendly; per-iteration estimates are returned for the
reference's IEF-health monitoring (train_multiview_regressor.py:663-670).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def identity_init_for_group(name: str, dim: int, n_pose: int = 0) -> np.ndarray:
    """Initial estimate per group: 6D identity for rotation groups, zeros else."""
    ident6 = np.array([1, 0, 0, 0, 1, 0], dtype=np.float32)
    if name == "global_rot" and dim == 6:
        return ident6
    if name == "joint_rot" and n_pose and dim == 6 * n_pose:
        return np.tile(ident6, n_pose)
    if name == "cam_rot" and dim == 9:
        return np.eye(3, dtype=np.float32).reshape(-1)
    if name == "fov" and dim == 1:
        return np.asarray([60.0], dtype=np.float32)
    if name == "cam_trans" and dim == 3:
        # start at the default camera distance, NOT at the model's origin —
        # a camera inside the mesh makes the projection losses blow up
        return np.asarray([0.0, 0.0, 2.7], dtype=np.float32)
    return np.zeros(dim, dtype=np.float32)


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    mlp_dim: int | None = None   # explicit width (reference transformer_mlp_dim)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, memory, deterministic: bool = True):
        # self-attention over the (single-token) query
        y = nn.LayerNorm(dtype=self.dtype)(query)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=self.dtype)(y, y)
        query = query + y
        # cross-attention to backbone tokens
        y = nn.LayerNorm(dtype=self.dtype)(query)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=self.dtype)(y, memory)
        query = query + y
        # feed-forward
        y = nn.LayerNorm(dtype=self.dtype)(query)
        y = nn.Dense(self.mlp_dim or int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return query + y


class SMILTransformerDecoderHead(nn.Module):
    """IEF decoder head over named output groups.

    Attributes:
      group_dims: ordered (name, dim) tuples summing to the output dimension.
      dim / depth / num_heads: decoder size.
      ief_iters: number of error-feedback refinement iterations.
      n_pose: number of posable joints (for 6D identity init of joint_rot).
    """

    group_dims: Sequence[Tuple[str, int]]
    dim: int = 512
    depth: int = 4
    num_heads: int = 8
    mlp_dim: int | None = None
    ief_iters: int = 3
    n_pose: int = 0
    token_dim: int = 0  # backbone token feature dim (0 → assume == dim)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True):
        """tokens (B, T, C) → (params dict name→(B, dim), history list)."""
        B = tokens.shape[0]
        total = sum(d for _, d in self.group_dims)

        init_vec = np.concatenate(
            [identity_init_for_group(n, d, self.n_pose) for n, d in self.group_dims]
        )
        init_estimate = self.param(
            "init_estimate", lambda key: jnp.asarray(init_vec, dtype=jnp.float32)
        )

        memory = nn.Dense(self.dim, dtype=self.dtype, name="memory_proj")(tokens)
        embed = nn.Dense(self.dim, dtype=self.dtype, name="estimate_embed")
        pre_norm = nn.LayerNorm(name="estimate_norm")
        layers = [
            DecoderLayer(self.dim, self.num_heads, mlp_dim=self.mlp_dim, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.depth)
        ]
        heads = {
            name: nn.Dense(d, kernel_init=nn.initializers.zeros, name=f"head_{name}")
            for name, d in self.group_dims
        }

        estimate = jnp.broadcast_to(init_estimate, (B, total))
        history = []
        for _ in range(self.ief_iters):
            q = embed(pre_norm(estimate))[:, None, :]  # (B, 1, dim)
            for layer in layers:
                q = layer(q, memory, deterministic=deterministic)
            q = q[:, 0]
            deltas = [heads[name](q) for name, _ in self.group_dims]
            estimate = estimate + jnp.concatenate(deltas, axis=-1)
            history.append(estimate)

        out = {}
        off = 0
        for name, d in self.group_dims:
            out[name] = estimate[:, off : off + d]
            off += d
        return out, history


class MLPHead(nn.Module):
    """3×(FC+LayerNorm+dropout) MLP head (reference smil_image_regressor.py:268-302)."""

    group_dims: Sequence[Tuple[str, int]]
    hidden: int = 1024
    dropout: float = 0.1
    n_pose: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True):
        x = pooled
        for i in range(3):
            x = nn.Dense(self.hidden, dtype=self.dtype)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        out = {}
        for name, d in self.group_dims:
            bias = identity_init_for_group(name, d, self.n_pose)
            out[name] = nn.Dense(
                d,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32, b=bias: jnp.asarray(b, dtype),
                name=f"head_{name}",
            )(x)
        return out, []
