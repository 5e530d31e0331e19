"""Rotation representations — pure jax math, no torch/pytorch3d.

Covers everything the reference pulls from ``pytorch3d.transforms`` and
``nibabel.eulerangles`` (reference: ``smal_fitter/neuralSMIL/smil_image_regressor.py:35-98``,
``smal_fitter/utils.py:78-80``): axis-angle ↔ rotation matrix ↔ 6D (Zhou et al.),
with robust wrappers, plus the intrinsic-ZYX euler → axis-angle helper used for
fitter initialization.

All functions operate on the trailing dimensions and broadcast over leading
batch dims, so they compose with vmap/jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rodrigues(theta: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) → rotation matrix (..., 3, 3).

    Matches the reference ``batch_rodrigues`` (smal_model/batch_lbs.py:31-50)
    numerically: the angle is the norm of ``theta + eps`` (a per-component bias
    that also makes the zero pose differentiable), and the axis is ``theta/angle``.
    """
    angle = jnp.linalg.norm(theta + eps, axis=-1, keepdims=True)  # (..., 1)
    r = theta / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    outer = r[..., :, None] * r[..., None, :]
    eye = jnp.eye(3, dtype=theta.dtype)
    K = skew(r)
    return cos * eye + (1.0 - cos) * outer + sin * K


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) → (..., 3, 3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def axis_angle_to_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """Numerically clean Rodrigues with a Taylor fallback near zero angle.

    Uses the double-where pattern so gradients stay finite at theta = 0."""
    norm_sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    small = norm_sq < 1e-12
    angle = jnp.sqrt(jnp.where(small, 1.0, norm_sq))
    safe_angle = angle
    r = jnp.where(small, jnp.zeros_like(theta), theta / safe_angle)
    angle = jnp.where(small, 0.0, angle)
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    outer = r[..., :, None] * r[..., None, :]
    eye = jnp.eye(3, dtype=theta.dtype)
    R = cos * eye + (1.0 - cos) * outer + sin * skew(r)
    # near zero: R ≈ I + skew(theta)
    R_taylor = eye + skew(theta)
    return jnp.where(small[..., None], R_taylor, R)


def matrix_to_axis_angle(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → axis-angle (..., 3) via quaternion."""
    q = matrix_to_quaternion(R)
    return quaternion_to_axis_angle(q, eps=eps)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → unit quaternion (..., 4) (w, x, y, z), branch-free.

    Uses the standard four-candidate construction and picks the best-conditioned
    one with jnp.where (traceable, no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = _sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = _sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = _sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = _sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_to_axis_angle(q: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    # double-where: the norm's gradient at 0 is 0/0 and would leak NaN through
    # a single where (identity rotations are the HEAD INIT, so this is hot)
    norm_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = norm_sq < eps * eps
    safe_norm_sq = jnp.where(small, 1.0, norm_sq)
    sin_half = jnp.sqrt(safe_norm_sq)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    axis = xyz / sin_half
    # tiny angles: aa ≈ 2*xyz (first-order)
    return jnp.where(small, 2.0 * xyz, axis * angle)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → 6D rep: first two ROWS flattened (pytorch3d convention)."""
    return R[..., :2, :].reshape(*R.shape[:-2], 6)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D (Zhou et al.) → rotation matrix via Gram-Schmidt (pytorch3d convention)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rotation_6d(aa: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(aa))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def robust_rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """NaN/Inf-guarded 6D→matrix (reference robust_* wrappers,
    smil_image_regressor.py:50-73): degenerate inputs fall back to identity."""
    d6 = jnp.nan_to_num(d6, nan=0.0, posinf=0.0, neginf=0.0)
    norm1 = jnp.linalg.norm(d6[..., :3], axis=-1, keepdims=True)
    bad = norm1 < 1e-6
    ident6 = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0, 1.0, 0], dtype=d6.dtype), d6.shape)
    return rotation_6d_to_matrix(jnp.where(bad, ident6, d6))


def euler_zyx_to_axis_angle(euler_xyz) -> np.ndarray:
    """Reference ``eul_to_axis`` (smal_fitter/utils.py:78-80): intrinsic
    R = Rz(e[2]) @ Ry(e[1]) @ Rx(e[0]) converted to axis-angle. Host-side numpy
    (used for fitter init constants)."""
    ex, ey, ez = float(euler_xyz[0]), float(euler_xyz[1]), float(euler_xyz[2])

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    R = rz(ez) @ ry(ey) @ rx(ex)
    aa = np.asarray(jax.device_get(matrix_to_axis_angle(jnp.asarray(R))))
    return aa
