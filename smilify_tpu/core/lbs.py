"""SMIL/SMAL forward: blendshapes → joint regression → kinematic chain → skinning.

This is the functional, TPU-first equivalent of the reference model forward
(``smal_model/smal_torch.py:198-370`` + ``smal_model/batch_lbs.py:75-197``):

* shape/pose blendshapes are single MXU matmuls over a (B, 3V) basis;
* the sequential parent-chain FK (a Python loop over joints in the reference,
  ``batch_lbs.py:155-180``) runs as **pointer-jumping** (parallel prefix over
  the kintree): ⌈log₂(depth)⌉ rounds of batched (J,4,4) matmuls with a jump
  schedule precomputed from the static parent array, instead of J−1 serially
  dependent steps — the backward pass is log-depth too. Per-joint log-scales
  (``S_par⁻¹·R·S`` cancellation or propagation) and per-joint translation
  offsets (Unreal y-flip, ``batch_lbs.py:146-148``) fold into the per-joint
  local transforms before the jumps. A ``lax.scan`` fallback handles the rare
  case of a traced parent array (spec passed as a jit argument);
* skinning transforms are the relative ``A = results − init_bone`` form
  (``batch_lbs.py:188-195``), applied as one (V,J)×(J,16) matmul.

Everything is a pure function of (ModelSpec, params); the public entry points
are batched (leading axis N) and jit/vmap/grad-compatible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from smilify_tpu.core.rotations import rodrigues
from smilify_tpu.core.spec import LEGACY_DOG_EXTRA_VERTEX_IDS, ModelSpec

# Geometry math must be true f32: JAX's default matmul precision is reduced
# (bf16-class) on both TPU and this CPU build, which corrupts kinematic-chain
# composition. The reference pins the SMAL forward to fp32 for the same reason
# (smil_image_regressor.py:2653).
HIGHEST = jax.lax.Precision.HIGHEST

# Unreal convention: per-joint translation offsets have their y axis flipped
# (reference batch_lbs.py:146-148).
_UNREAL_Y_FLIP = jnp.array([1.0, -1.0, 1.0])


class SmilOutputs(NamedTuple):
    verts: jnp.ndarray          # (N, V, 3) skinned vertices (+trans)
    joints: jnp.ndarray         # (N, K, 3) joint / keypoint locations (+trans)
    Rs: jnp.ndarray             # (N, J, 3, 3) per-joint rotation matrices
    v_shaped: jnp.ndarray       # (N, V, 3) shape-blendshaped template
    j_transformed: jnp.ndarray  # (N, J, 3) FK joint locations (pre trans)


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle → (..., 3, 3); matches reference batch_rodrigues."""
    return rodrigues(theta)


def _make_A(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """R (3,3), t (3,) → homogeneous (4,4)."""
    top = jnp.concatenate([R, t[:, None]], axis=1)          # (3, 4)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)
    return jnp.concatenate([top, bottom], axis=0)


@functools.lru_cache(maxsize=32)
def _jump_schedule(parents_key: tuple):
    """Pointer-jumping schedule for a static parent array.

    Returns a tuple of (idx, mask) rounds: after initializing the per-joint
    segment products M[i] = A_local[i] with remaining-ancestor anc[i] =
    parent[i] (root: done), each round performs
    ``M[i] ← M[idx[i]] @ M[i] where mask[i]`` and squares the jump distance,
    so round r prepends the 2^r-ancestor segment. ⌈log₂(max depth)⌉ rounds
    complete every root-to-joint chain product.
    """
    parents = np.asarray(parents_key, dtype=np.int64)
    J = parents.shape[0]
    anc = parents.copy()
    anc[0] = -1  # root segment is already complete
    rounds = []
    # depth ≤ J, so ≤ ⌈log₂(J)⌉+1 rounds; more means the parent array has a
    # cycle/self-loop (corrupt kintree) — fail fast instead of spinning
    max_rounds = int(np.ceil(np.log2(max(J, 2)))) + 1
    while np.any(anc >= 0):
        if len(rounds) >= max_rounds:
            raise ValueError(
                f"kintree parent array is cyclic (no topological order): {parents}"
            )
        idx = np.maximum(anc, 0)
        mask = anc >= 0
        rounds.append((tuple(int(v) for v in idx), tuple(bool(v) for v in mask)))
        anc = np.where(mask, anc[idx], -1)
    return tuple(rounds)


def global_rigid_transformation(
    Rs: jnp.ndarray,
    Js: jnp.ndarray,
    parents: jnp.ndarray,
    log_scales: Optional[jnp.ndarray] = None,
    trans_offsets: Optional[jnp.ndarray] = None,
    propagate_scaling: bool = False,
):
    """Single-sample forward kinematics over the kintree.

    Args:
      Rs: (J, 3, 3) per-joint rotations.
      Js: (J, 3) rest joint locations.
      parents: (J,) int32 parent ids (root's entry unused).
      log_scales: optional (J, 3) per-joint per-axis log scale factors.
      trans_offsets: optional (J, 3) per-joint translation offsets
        (y-flipped internally, Unreal convention).
      propagate_scaling: if True, parent scale is NOT cancelled (scales
        compound down the chain); if False applies S_parent⁻¹·R·S_joint.

    Returns:
      new_J: (J, 3) posed joint locations.
      A: (J, 4, 4) relative skinning transforms (final − init bone).
    """
    J = Js.shape[0]
    dtype = Rs.dtype

    scales = jnp.exp(log_scales) if log_scales is not None else jnp.ones((J, 3), dtype=dtype)
    inv_scales = jnp.ones_like(scales) if propagate_scaling else 1.0 / scales

    offs = (
        trans_offsets * _UNREAL_Y_FLIP.astype(dtype)
        if trans_offsets is not None
        else jnp.zeros((J, 3), dtype=dtype)
    )

    # rot_new[i] = diag(1/s[parent]) @ R[i] @ diag(s[i]) — as row/col scaling
    parent_inv = inv_scales[parents]                          # (J, 3)
    rot_scaled = Rs * parent_inv[:, :, None] * scales[:, None, :]

    j_offsets = Js - Js[parents] + offs                       # (J, 3); root fixed below

    # per-joint local transforms; the root uses its raw rotation and rest
    # location (scale adjustment applies only below the root, matching the
    # reference's special-cased first iteration, batch_lbs.py:155-162)
    rot_local = rot_scaled.at[0].set(Rs[0])
    off_local = j_offsets.at[0].set(Js[0])
    tops = jnp.concatenate([rot_local, off_local[:, :, None]], axis=2)   # (J, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype), (J, 1, 4)
    )
    A_local = jnp.concatenate([tops, bottom], axis=1)                    # (J, 4, 4)

    try:
        parents_static = tuple(int(p) for p in np.asarray(parents))
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        parents_static = None

    if parents_static is not None:
        # pointer jumping: log₂(depth) rounds of batched 4x4 chain products
        results = A_local
        for idx, mask in _jump_schedule(parents_static):
            idx_a = jnp.asarray(idx, jnp.int32)
            mask_a = jnp.asarray(mask)[:, None, None]
            jumped = jnp.matmul(results[idx_a], results, precision=HIGHEST)
            results = jnp.where(mask_a, jumped, results)
    else:
        # traced parent array (spec passed through jit): sequential scan
        results0 = jnp.zeros((J, 4, 4), dtype=dtype).at[0].set(A_local[0])

        def step(results, i):
            res_here = jnp.matmul(results[parents[i]], A_local[i], precision=HIGHEST)
            results = results.at[i].set(res_here)
            return results, None

        results, _ = jax.lax.scan(step, results0, jnp.arange(1, J))

    new_J = results[:, :3, 3]

    # A = results − pad(results @ [J_rest; 0]) — skinning uses bone *motion*
    init_bone = jnp.einsum("jab,jb->ja", results[:, :, :3], Js, precision=HIGHEST)  # (J, 4)
    A = results.at[:, :, 3].add(-init_bone)
    return new_J, A


def _forward_single(
    spec: ModelSpec,
    beta: jnp.ndarray,           # (B,)
    theta: jnp.ndarray,          # (J, 3) axis-angle or (J, 3, 3) matrices
    trans: jnp.ndarray,          # (3,)
    del_v: Optional[jnp.ndarray],        # (V, 3) or None
    log_scales: Optional[jnp.ndarray],   # (J, 3) or None
    joint_trans: Optional[jnp.ndarray],  # (J, 3) or None
    v_template: Optional[jnp.ndarray],   # (V, 3) or None
    propagate_scaling: bool,
):
    V, J = spec.n_verts, spec.n_joints
    base = spec.v_template if v_template is None else v_template

    # 1. shape blendshapes
    n_b = beta.shape[0]
    if n_b > 0:
        dv = jnp.matmul(beta, spec.shapedirs[:n_b], precision=HIGHEST).reshape(V, 3)
        v_shaped = base + dv
    else:
        v_shaped = base
    if del_v is not None:
        v_shaped = v_shaped + del_v

    # 2. joints from shape (or static)
    if spec.static_joint_locations:
        Js = spec.joints_rest
    else:
        Js = jnp.matmul(v_shaped.T, spec.J_regressor, precision=HIGHEST)  # (3, J)
        Js = Js.T

    # 3. pose rotations + pose blendshapes
    Rs = theta if theta.ndim == 3 else rodrigues(theta)
    pose_feature = (Rs[1:] - jnp.eye(3, dtype=Rs.dtype)).reshape(-1)  # (9(J-1),)
    v_posed = v_shaped + jnp.matmul(pose_feature, spec.posedirs, precision=HIGHEST).reshape(V, 3)

    # 4. FK
    j_transformed, A = global_rigid_transformation(
        Rs, Js, spec.parents, log_scales, joint_trans, propagate_scaling
    )

    # 5. skinning: one (V,J)@(J,16) matmul then per-vertex affine apply
    T = jnp.matmul(spec.weights, A.reshape(J, 16), precision=HIGHEST).reshape(V, 4, 4)
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed, precision=HIGHEST) + T[:, :3, 3]

    verts = verts + trans

    # 6. joints: static → FK results; else re-regress from skinned verts.
    # NOTE reference quirk preserved: in the static path the returned joints
    # do NOT include `trans` (smal_torch.py:343-346 returns J_transformed
    # as-is); callers like the fitter add translation themselves.
    if spec.static_joint_locations:
        joints = j_transformed
    else:
        joints = jnp.matmul(verts.T, spec.J_regressor, precision=HIGHEST).T

    if spec.legacy_dog_keypoints:
        extra = verts[jnp.array(LEGACY_DOG_EXTRA_VERTEX_IDS)]
        joints = jnp.concatenate([joints, extra], axis=0)

    return verts, joints, Rs, v_shaped, j_transformed


def smil_forward(
    spec: ModelSpec,
    beta: jnp.ndarray,
    theta: jnp.ndarray,
    trans: Optional[jnp.ndarray] = None,
    del_v: Optional[jnp.ndarray] = None,
    log_scales: Optional[jnp.ndarray] = None,
    joint_trans: Optional[jnp.ndarray] = None,
    v_template: Optional[jnp.ndarray] = None,
    propagate_scaling: bool = False,
) -> SmilOutputs:
    """Batched SMIL forward.

    Args (N = batch):
      beta: (N, B) shape coefficients (B may be < spec.n_betas; 0 allowed).
      theta: (N, J, 3) axis-angle (root first) or (N, J, 3, 3) matrices.
      trans: (N, 3) global translation (defaults to zero).
      del_v: (N, V, 3) per-vertex offsets (mesh-registration deformations).
      log_scales: (N, J, 3) per-joint log scales (limb scaling).
      joint_trans: (N, J, 3) per-joint translation offsets (Unreal y-flip applied).
      v_template: (N, V, 3) per-sample template override.
      propagate_scaling: propagate parent scales instead of cancelling.

    Returns :class:`SmilOutputs`.
    """
    N = theta.shape[0]
    if trans is None:
        trans = jnp.zeros((N, 3), dtype=spec.v_template.dtype)

    in_axes = (
        None,
        0,
        0,
        0,
        0 if del_v is not None else None,
        0 if log_scales is not None else None,
        0 if joint_trans is not None else None,
        0 if v_template is not None else None,
        None,
    )
    verts, joints, Rs, v_shaped, j_tr = jax.vmap(_forward_single, in_axes=in_axes)(
        spec, beta, theta, trans, del_v, log_scales, joint_trans, v_template, propagate_scaling
    )
    return SmilOutputs(verts, joints, Rs, v_shaped, j_tr)
