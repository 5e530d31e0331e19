"""ModelSpec — the immutable, explicit model description.

The reference keeps model state in import-time module globals (``config.py:76-141``:
``dd``, ``N_POSE``, ``N_BETAS``, ``STATIC_JOINT_LOCATIONS``, ``TORSO_JOINTS``) and
reloads them to switch models (``configs/config_utils.py:238``). Here the same
information is a frozen pytree constructed once by :func:`load_model_spec` and passed
explicitly through every call chain — jit-friendly and race-free.

Array leaves are jnp arrays (device-resident, f32/int32); structural metadata
(joint names, flags, counts) are static aux data so a jitted function recompiles
when the *model* changes but not when parameters change.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from smilify_tpu.core.io import load_raw_model
from smilify_tpu.core.symmetry import align_template_to_symmetry_axis

# Default torso-joint names used for stage-0 camera alignment on SMIL insect
# models (reference config.py:107-109) and joints whose annotations are ignored
# (config.py:118).
DEFAULT_TORSO_JOINT_NAMES = ("b_a_1", "l_1_co_r", "l_1_co_l", "b_h", "ma_l", "ma_r")
DEFAULT_IGNORE_JOINT_NAMES = ("b_t", "b_a_4", "b_a_5")

# Legacy 35-joint quadruped (WLDO/SMAL dog) surface keypoints appended to the
# regressed joints (reference smal_model/smal_torch.py:353-365).
_LEGACY_DOG_EXTRA_VERTEX_IDS = (1863, 26, 2124, 150, 3055, 1097)


@struct.dataclass
class ModelSpec:
    # --- array leaves (device) ---
    v_template: jnp.ndarray          # (V, 3) f32 — symmetry-aligned template
    faces: jnp.ndarray               # (F, 3) i32
    shapedirs: jnp.ndarray           # (B, 3V) f32 — betas @ shapedirs → Δverts
    posedirs: jnp.ndarray            # (9(J-1), 3V) f32 — pose feature → Δverts
    J_regressor: jnp.ndarray         # (V, J) f32 — verts.T @ Jr → joints
    weights: jnp.ndarray             # (V, J) f32 — LBS skinning weights
    parents: jnp.ndarray             # (J,) i32 — parent joint ids (root → 0)
    joints_rest: jnp.ndarray         # (J, 3) f32 — rest joints (static-joint models; zeros otherwise)
    shape_mean_betas: jnp.ndarray    # (B,) f32 — zeros when absent
    shape_cov: jnp.ndarray           # (B, B) f32 — identity when absent
    scaledirs: Optional[jnp.ndarray] = None   # (B, J, 3) f32 — entangled PCA joint scales
    transdirs: Optional[jnp.ndarray] = None   # (B, J, 3) f32 — entangled PCA joint translations

    # --- static metadata (aux data; hashable) ---
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    n_verts: int = struct.field(pytree_node=False, default=0)
    n_faces: int = struct.field(pytree_node=False, default=0)
    n_joints: int = struct.field(pytree_node=False, default=0)
    n_betas: int = struct.field(pytree_node=False, default=0)
    static_joint_locations: bool = struct.field(pytree_node=False, default=False)
    has_shape_prior: bool = struct.field(pytree_node=False, default=False)
    legacy_dog_keypoints: bool = struct.field(pytree_node=False, default=False)
    root_joint: str = struct.field(pytree_node=False, default="")
    torso_joints: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    ignore_joints: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # host-side authoring metadata (not pytree leaves)
    left_inds: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    right_inds: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    center_inds: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    source_path: str = struct.field(pytree_node=False, default="")

    @property
    def n_pose(self) -> int:
        """Number of posable joints excluding the root (reference N_POSE, config.py:130)."""
        return self.n_joints - 1

    @property
    def total_keypoints(self) -> int:
        return self.n_joints + (6 if self.legacy_dog_keypoints else 0)


def _normalize_parents(kintree_row: np.ndarray, n_joints: int) -> np.ndarray:
    """Root parent is stored as -1 (or uint32 wraparound); remap to 0 — the
    root's parent entry is never used by the FK because joint 0 is handled
    separately."""
    parents = kintree_row.astype(np.int64)
    parents[(parents < 0) | (parents >= n_joints)] = 0
    return parents.astype(np.int32)


def _morton_order(centroids: np.ndarray, bits: int = 10) -> np.ndarray:
    """Spatial sort of face centroids along a Morton (Z-order) curve.

    Faces that are close in space end up close in memory, which tightens the
    per-chunk bounding boxes the Pallas rasterizer culls against."""
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    q = ((centroids - lo) / np.maximum(hi - lo, 1e-12) * (2**bits - 1)).astype(np.uint64)

    def spread(x):
        x &= np.uint64((1 << bits) - 1)
        x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def load_model_spec(
    path: str,
    *,
    align_symmetry: bool = True,
    spatial_sort_faces: bool = True,
    shape_family: int = -1,
    smal_data_file: Optional[str] = None,
    dtype=jnp.float32,
) -> ModelSpec:
    """Load a ``.pkl`` model asset into a :class:`ModelSpec`.

    ``align_symmetry=False`` reproduces the reference's ``ignore_sym=True``
    default for custom models (config.py:52): the template is used as-is.
    ``spatial_sort_faces`` reorders the (semantically order-free) face list
    along a Morton curve for rasterizer cull locality.
    ``shape_family >= 0`` bakes that family's cluster-mean betas (from the
    legacy SMAL data file) into the template — the reference's
    ``shape_family_id`` path (smal_torch.py:133-139); SMIL models use -1.
    """
    dd = load_raw_model(path)

    v_template = np.asarray(dd["v_template"], dtype=np.float64)
    if shape_family is not None and shape_family >= 0:
        if not smal_data_file:
            raise ValueError("shape_family >= 0 needs smal_data_file (cluster means)")
        data = load_raw_model(smal_data_file)
        betas_fam = np.asarray(data["cluster_means"][shape_family], dtype=np.float64)
        sdir = np.asarray(dd["shapedirs"], dtype=np.float64).reshape(-1, betas_fam.shape[0])
        v_template = v_template + (sdir @ betas_fam).reshape(v_template.shape)
    faces = np.asarray(dd["f"], dtype=np.int32)
    V = v_template.shape[0]
    if spatial_sort_faces and len(faces):
        centroids = v_template[faces].mean(axis=1)
        faces = faces[_morton_order(centroids)]

    left_inds = right_inds = center_inds = np.empty(0, dtype=int)
    if align_symmetry:
        sym_verts = dd.get("sym_verts")
        if sym_verts is None:
            raise ValueError(f"{path}: align_symmetry requested but no 'sym_verts' in model")
        v_template, left_inds, right_inds, center_inds = align_template_to_symmetry_axis(
            v_template, np.asarray(sym_verts, dtype=int)
        )

    # shape blendshapes → (B, 3V) so that `betas @ shapedirs` gives row-major (V,3)
    sdir = dd.get("shapedirs")
    if sdir is not None and np.asarray(sdir).size > 0:
        sdir = np.asarray(sdir, dtype=np.float64)
        n_betas = sdir.shape[-1]
        shapedirs = sdir.reshape(-1, n_betas).T
    else:
        n_betas = 0
        shapedirs = np.zeros((0, 3 * V))

    # J_regressor stored (J, V); keep (V, J) for verts-major matmuls
    Jr = np.asarray(dd["J_regressor"], dtype=np.float64)
    n_joints = Jr.shape[0]
    J_regressor = Jr.T

    # pose blendshapes → (9(J-1), 3V); zero matrix when the model ships none
    pdir = dd.get("posedirs")
    n_pose_basis = 9 * (n_joints - 1)
    if pdir is not None and np.asarray(pdir).size > 0:
        pdir = np.asarray(pdir, dtype=np.float64)
        posedirs = pdir.reshape(-1, pdir.shape[-1]).T
    else:
        posedirs = np.zeros((n_pose_basis, 3 * V))

    parents = _normalize_parents(np.asarray(dd["kintree_table"])[0], n_joints)

    weights = np.asarray(dd["weights"], dtype=np.float64)

    static_joints = bool(dd.get("static_joint_locs", False))
    joints_rest = np.asarray(dd["J"], dtype=np.float64) if "J" in dd else np.zeros((n_joints, 3))

    raw_names = dd.get("J_names")
    joint_names = tuple(str(n) for n in raw_names) if raw_names is not None else tuple(
        f"joint_{i}" for i in range(n_joints)
    )

    has_prior = "shape_cov" in dd and "shape_mean_betas" in dd
    shape_cov = (
        np.asarray(dd["shape_cov"], dtype=np.float64) if has_prior else np.eye(max(n_betas, 1))
    )
    shape_mean_betas = (
        np.asarray(dd["shape_mean_betas"], dtype=np.float64)[:n_betas]
        if has_prior
        else np.zeros(max(n_betas, 1))
    )

    scaledirs = dd.get("scaledirs")
    transdirs = dd.get("transdirs")

    name2id = {n: i for i, n in enumerate(joint_names)}
    torso = tuple(name2id[n] for n in DEFAULT_TORSO_JOINT_NAMES if n in name2id)
    ignore = tuple(name2id[n] for n in DEFAULT_IGNORE_JOINT_NAMES if n in name2id)

    root_idx = int(np.nonzero(np.asarray(dd["kintree_table"])[0].astype(np.int64) < 0)[0][0]) if (
        np.asarray(dd["kintree_table"])[0].astype(np.int64) < 0
    ).any() else 0

    return ModelSpec(
        v_template=jnp.asarray(v_template, dtype=dtype),
        faces=jnp.asarray(faces),
        shapedirs=jnp.asarray(shapedirs, dtype=dtype),
        posedirs=jnp.asarray(posedirs, dtype=dtype),
        J_regressor=jnp.asarray(J_regressor, dtype=dtype),
        weights=jnp.asarray(weights, dtype=dtype),
        parents=jnp.asarray(parents),
        joints_rest=jnp.asarray(joints_rest, dtype=dtype),
        shape_mean_betas=jnp.asarray(shape_mean_betas, dtype=dtype),
        shape_cov=jnp.asarray(shape_cov, dtype=dtype),
        scaledirs=jnp.asarray(scaledirs, dtype=dtype) if scaledirs is not None else None,
        transdirs=jnp.asarray(transdirs, dtype=dtype) if transdirs is not None else None,
        joint_names=joint_names,
        n_verts=V,
        n_faces=faces.shape[0],
        n_joints=n_joints,
        n_betas=n_betas,
        static_joint_locations=static_joints,
        has_shape_prior=has_prior,
        legacy_dog_keypoints=(n_joints == 35 and raw_names is None),
        root_joint=joint_names[root_idx],
        torso_joints=torso,
        ignore_joints=ignore,
        left_inds=tuple(int(i) for i in left_inds),
        right_inds=tuple(int(i) for i in right_inds),
        center_inds=tuple(int(i) for i in center_inds),
        source_path=str(path),
    )


LEGACY_DOG_EXTRA_VERTEX_IDS = _LEGACY_DOG_EXTRA_VERTEX_IDS
