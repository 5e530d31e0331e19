"""Pose / shape / joint-limit priors.

Functional equivalents of the reference priors:
  * dynamic pose prior — identity-precision zero-mean Mahalanobis over all
    joint angles, root excluded (``smal_fitter/fitter.py:25-52``);
  * dynamic joint-limit prior — ±0.01 "ball joint" ranges per non-root joint
    (``smal_fitter/priors/joint_limits_prior.py:8-15,54-66``);
  * shape prior — Cholesky-precision Mahalanobis from the model's
    ``shape_cov`` / ``shape_mean_betas`` (``fitter.py:121-175``);
  * legacy walking pose prior — loaded from the (non-redistributable) SMAL
    pkl with full covariance (``priors/pose_prior_35.py``), supported when the
    file is present.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from smilify_tpu.core.spec import ModelSpec

HIGHEST = jax.lax.Precision.HIGHEST


class PosePrior(NamedTuple):
    """x (N, J, 3) axis-angle (root first) → (N, 3J) squared residuals."""

    mean: jnp.ndarray      # (3J,)
    precs: jnp.ndarray     # (3J, 3J)
    use_mask: jnp.ndarray  # (3J,) float — 0 for the root entries

    def __call__(self, theta: jnp.ndarray) -> jnp.ndarray:
        x = theta.reshape(theta.shape[0], -1) - self.mean
        res = jnp.matmul(x, self.precs, precision=HIGHEST) * self.use_mask
        return res**2


def default_pose_prior(spec: ModelSpec, dtype=jnp.float32) -> PosePrior:
    """Identity-precision zero-mean prior over all joints, root excluded."""
    n = 3 * spec.n_joints
    mask = np.ones(n, dtype=np.float32)
    mask[:3] = 0.0
    return PosePrior(
        mean=jnp.zeros((n,), dtype=dtype),
        precs=jnp.eye(n, dtype=dtype),
        use_mask=jnp.asarray(mask, dtype=dtype),
    )


def walking_pose_prior(pkl_path: str, dtype=jnp.float32) -> PosePrior:
    """Legacy SMAL walking prior (35-part quadruped); mean + precision from pkl."""
    import pickle

    with open(pkl_path, "rb") as f:
        u = pickle._Unpickler(f)
        u.encoding = "latin1"
        res = u.load()
    mean = np.asarray(res["mean_pose"], dtype=np.float64)
    precs = np.asarray(res["pic"], dtype=np.float64)
    n = precs.shape[0]
    mask = np.ones(n, dtype=np.float32)
    mask[:3] = 0.0
    return PosePrior(
        mean=jnp.asarray(np.concatenate([np.zeros(3), mean])[:n], dtype=dtype),
        precs=jnp.asarray(precs, dtype=dtype),
        use_mask=jnp.asarray(mask, dtype=dtype),
    )


class LimitPrior(NamedTuple):
    """Hinge penalty outside per-joint per-axis [min, max] ranges (root excluded)."""

    min_limits: jnp.ndarray  # (P, 3) — P = n_joints − 1
    max_limits: jnp.ndarray  # (P, 3)

    def __call__(self, joint_rot: jnp.ndarray) -> jnp.ndarray:
        """joint_rot (N, P, 3) → mean hinge violation (scalar)."""
        over = jnp.maximum(joint_rot - self.max_limits, 0.0)
        under = jnp.maximum(self.min_limits - joint_rot, 0.0)
        return jnp.mean(over + under)


def default_limit_prior(spec: ModelSpec, ball_range: float = 0.01, dtype=jnp.float32) -> LimitPrior:
    """All non-root joints treated as ±ball_range ball joints (SMIL default)."""
    P = spec.n_joints - 1
    return LimitPrior(
        min_limits=jnp.full((P, 3), -ball_range, dtype=dtype),
        max_limits=jnp.full((P, 3), ball_range, dtype=dtype),
    )


class ShapePrior(NamedTuple):
    """Mahalanobis shape prior: mean((‖(β − μ) L‖²)) with L = chol((Σ+εI)⁻¹)."""

    mean_betas: jnp.ndarray  # (B,)
    precs: jnp.ndarray       # (B, B) Cholesky factor of the precision

    def __call__(self, betas: jnp.ndarray) -> jnp.ndarray:
        diff = betas - self.mean_betas
        res = jnp.matmul(diff, self.precs, precision=HIGHEST)
        return jnp.mean(res**2)


def shape_prior_from_spec(spec: ModelSpec, n_betas: Optional[int] = None, dtype=jnp.float32) -> ShapePrior:
    n_b = n_betas or spec.n_betas
    cov = np.asarray(spec.shape_cov, dtype=np.float64)
    invcov = np.linalg.inv(cov + 1e-5 * np.eye(cov.shape[0]))
    prec = np.linalg.cholesky(invcov)[:n_b, :n_b]
    mean = np.asarray(spec.shape_mean_betas, dtype=np.float64)[:n_b]
    return ShapePrior(
        mean_betas=jnp.asarray(mean, dtype=dtype),
        precs=jnp.asarray(prec, dtype=dtype),
    )


def unity_shape_prior(npz_path: str, n_betas: int = 20, dtype=jnp.float32):
    """WLDO Unity dog prior (betas ⊕ 6 scale params); reference fitter.py:86-107."""
    data = np.load(npz_path)
    cov = data["cov"][:-1, :-1]
    mean = data["mean"][:-1]
    invcov = np.linalg.inv(cov + 1e-5 * np.eye(cov.shape[0]))
    prec = np.linalg.cholesky(invcov)
    return ShapePrior(
        mean_betas=jnp.asarray(mean, dtype=dtype),
        precs=jnp.asarray(prec, dtype=dtype),
    )
