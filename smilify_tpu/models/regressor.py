"""Single-view image→SMIL-parameter regressor + loss engine.

TPU-first re-design of the reference ``neuralSMIL/smil_image_regressor.py``.
The network is a Flax module (backbone → MLP or IEF transformer head emitting
named parameter groups); the loss engine is a pure function over
(ModelSpec, predictions, targets) that reuses the fitter's differentiable
render/projection path. The reference's nn.Module inheritance spine
(SMAL→SMALFitter→Regressor) is replaced by function composition.

Output groups (reference _calculate_output_dims:206-266):
  global_rot (6d|3), joint_rot (P×(6|3)), betas (B), trans (3), fov (1),
  cam_rot (9, flattened 3×3), cam_trans (3), and — in scale_trans_mode
  'separate' — either PCA weights (B each) or per-joint values (J×3) for
  limb scales/translations. Mode 'entangled_with_betas' folds them into
  betas via the model's scaledirs/transdirs.

Default loss weights replicate smil_image_regressor.py:1311-1327.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from smilify_tpu.core.lbs import smil_forward
from smilify_tpu.core.rotations import (
    matrix_to_axis_angle,
    robust_rotation_6d_to_matrix,
)
from smilify_tpu.core.spec import ModelSpec
from smilify_tpu.models.backbones import create_backbone
from smilify_tpu.models.transformer_decoder import MLPHead, SMILTransformerDecoderHead
from smilify_tpu.render.cameras import default_camera

HIGHEST = jax.lax.Precision.HIGHEST

DEFAULT_LOSS_WEIGHTS: Dict[str, float] = {
    "global_rot": 0.02,
    "joint_rot": 0.02,
    "betas": 0.01,
    "trans": 0.001,
    "fov": 0.001,
    "cam_rot": 0.01,
    "cam_trans": 0.001,
    "log_beta_scales": 0.1,
    "betas_trans": 0.1,
    "keypoint_2d": 0.0,
    "keypoint_3d": 0.0,
    "silhouette": 0.0,
    "joint_angle_regularization": 0.001,
    "limb_scale_regularization": 0.01,
    "limb_trans_regularization": 0.1,
}


@dataclasses.dataclass(frozen=True)
class RegressorConfig:
    backbone: str = "resnet50"
    head_type: str = "transformer"        # 'transformer' | 'mlp'
    rotation_representation: str = "6d"   # '6d' | 'axis_angle'
    n_pose: int = 54
    n_betas: int = 5
    n_joints: int = 55
    scale_trans_mode: str = "ignore"      # 'ignore' | 'separate' | 'entangled_with_betas'
    use_pca_scale_trans: bool = True      # 'separate' mode: PCA weights vs per-joint
    ief_iters: int = 3
    decoder_dim: int = 512
    decoder_depth: int = 4
    decoder_heads: int = 8
    decoder_mlp_dim: Optional[int] = None   # None → 4×dim (reference transformer_mlp_dim)
    mlp_hidden: int = 1024
    dropout: float = 0.1
    compute_dtype: Any = jnp.bfloat16
    # per-joint translation outputs scaled down to ease optimization
    # (reference transformer_decoder.py:132 trans_scale_factor)
    trans_scale_factor: float = 1.0
    # optional global mesh-scale output (reference mesh_scaling config,
    # smil_image_regressor.py:2677: center at root, scale, translate)
    allow_mesh_scaling: bool = False
    init_mesh_scale: float = 1.0
    use_log_mesh_scale: bool = True
    # replicAnt UE convention: ×10 about the root (smil_image_regressor.py:2672)
    use_ue_scaling: bool = False

    def group_dims(self):
        rot = 6 if self.rotation_representation == "6d" else 3
        groups = [
            ("global_rot", rot),
            ("joint_rot", self.n_pose * rot),
            ("betas", self.n_betas),
            ("trans", 3),
            ("fov", 1),
            ("cam_rot", 9),
            ("cam_trans", 3),
        ]
        if self.scale_trans_mode == "separate":
            if self.use_pca_scale_trans:
                groups += [("scale_weights", self.n_betas), ("trans_weights", self.n_betas)]
            else:
                groups += [
                    ("log_beta_scales", self.n_joints * 3),
                    ("betas_trans", self.n_joints * 3),
                ]
        if self.allow_mesh_scaling:
            groups += [("mesh_scale", 1)]
        return tuple(groups)


class SMILRegressor(nn.Module):
    """Backbone + head; returns raw parameter groups and the IEF history."""

    config: RegressorConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.config
        backbone, feat_dim = create_backbone(cfg.backbone, dtype=cfg.compute_dtype)
        feats = backbone(images, train=train)
        if cfg.head_type == "transformer":
            head = SMILTransformerDecoderHead(
                group_dims=cfg.group_dims(),
                dim=cfg.decoder_dim,
                depth=cfg.decoder_depth,
                num_heads=cfg.decoder_heads,
                mlp_dim=cfg.decoder_mlp_dim,
                ief_iters=cfg.ief_iters,
                n_pose=cfg.n_pose,
            )
            out, history = head(feats.tokens, deterministic=not train)
        else:
            head = MLPHead(
                group_dims=cfg.group_dims(),
                hidden=cfg.mlp_hidden,
                dropout=cfg.dropout,
                n_pose=cfg.n_pose,
            )
            out, history = head(feats.pooled, deterministic=not train)
        return out, history


# ---------------------------------------------------------------------------
# prediction decoding
# ---------------------------------------------------------------------------


def decode_predictions(cfg: RegressorConfig, raw: Dict[str, jnp.ndarray], spec: Optional[ModelSpec] = None):
    """Raw head outputs → physical parameters.

    Returns dict with axis-angle rotations, per-joint scale/translation arrays,
    camera (R matrix via 6d-robust orthogonalization of the 9-dim output's
    first 6 entries is NOT used — the reference regresses a raw 3×3 which we
    orthogonalize via SVD-free Gram-Schmidt on rows), fov, trans, betas.
    """
    B = raw["global_rot"].shape[0]
    rot6d = cfg.rotation_representation == "6d"

    if rot6d:
        g_mat = robust_rotation_6d_to_matrix(raw["global_rot"])
        global_rot = matrix_to_axis_angle(g_mat)
        j_mat = robust_rotation_6d_to_matrix(raw["joint_rot"].reshape(B, cfg.n_pose, 6))
        joint_rot = matrix_to_axis_angle(j_mat)
    else:
        global_rot = raw["global_rot"]
        joint_rot = raw["joint_rot"].reshape(B, cfg.n_pose, 3)

    out = {
        "global_rot": global_rot,
        "joint_rot": joint_rot,
        "betas": raw["betas"],
        "trans": raw["trans"],
        "fov": raw["fov"][:, 0],
        "cam_rot": robust_rotation_6d_to_matrix(raw["cam_rot"][:, :6]),
        "cam_trans": raw["cam_trans"],
    }

    J = cfg.n_joints
    if cfg.scale_trans_mode == "separate":
        if cfg.use_pca_scale_trans and spec is not None and spec.scaledirs is not None:
            out["log_beta_scales"] = jnp.einsum(
                "nb,bjc->njc", raw["scale_weights"], spec.scaledirs, precision=HIGHEST
            )
            out["betas_trans"] = jnp.einsum(
                "nb,bjc->njc", raw["trans_weights"], spec.transdirs, precision=HIGHEST
            )
            out["scale_weights"] = raw["scale_weights"]
            out["trans_weights"] = raw["trans_weights"]
        elif not cfg.use_pca_scale_trans:
            out["log_beta_scales"] = raw["log_beta_scales"].reshape(B, J, 3)
            out["betas_trans"] = raw["betas_trans"].reshape(B, J, 3)
    elif cfg.scale_trans_mode == "entangled_with_betas" and spec is not None and spec.scaledirs is not None:
        out["log_beta_scales"] = jnp.einsum(
            "nb,bjc->njc", raw["betas"], spec.scaledirs, precision=HIGHEST
        )
        out["betas_trans"] = jnp.einsum(
            "nb,bjc->njc", raw["betas"], spec.transdirs, precision=HIGHEST
        )
    if "betas_trans" in out and cfg.trans_scale_factor != 1.0:
        out["betas_trans"] = out["betas_trans"] * cfg.trans_scale_factor
    if cfg.allow_mesh_scaling and "mesh_scale" in raw:
        ms = raw["mesh_scale"][:, 0]
        out["mesh_scale"] = (
            jnp.exp(ms) * cfg.init_mesh_scale if cfg.use_log_mesh_scale
            else ms + cfg.init_mesh_scale
        )
    return out


def forward_model(spec: ModelSpec, preds: Dict[str, jnp.ndarray],
                  propagate_scaling: bool = False, use_ue_scaling: bool = False):
    """SMIL forward with predicted parameters → (verts, joints3d) in model space.

    ``use_ue_scaling`` applies the replicAnt ×10-about-root convention;
    a ``mesh_scale`` prediction applies a learned scale about the root
    (reference smil_image_regressor.py:2671-2687)."""
    theta = jnp.concatenate([preds["global_rot"][:, None, :], preds["joint_rot"]], axis=1)
    scaled = use_ue_scaling or "mesh_scale" in preds
    out = smil_forward(
        spec,
        preds["betas"],
        theta,
        trans=None if scaled else preds["trans"],
        log_scales=preds.get("log_beta_scales"),
        joint_trans=preds.get("betas_trans"),
        propagate_scaling=propagate_scaling,
    )
    if scaled:
        s = 10.0 if use_ue_scaling else preds["mesh_scale"][:, None, None]
        root = out.j_transformed[:, :1, :]
        trans = preds["trans"][:, None, :]
        verts = (out.verts - root) * s + trans
        joints = (out.joints - root) * s + trans
        return verts, joints
    joints = out.joints
    if spec.static_joint_locations:
        joints = joints + preds["trans"][:, None, :]
    return out.verts, joints


def project_to_camera(
    preds: Dict[str, jnp.ndarray],
    points: jnp.ndarray,
    image_size: Tuple[int, int],
):
    """Project (N, K, 3) model-space points through the predicted cameras to
    normalized [0, 1] (y, x) image coordinates."""
    H, W = image_size

    def one(R, T, fov, pts):
        cam = default_camera().replace(R=R, T=T, fov=fov)
        # eps guards against points at the camera plane (reference nan_to_num
        # guards, smil_image_regressor.py:2597-2632)
        yx = cam.project_points_yx(pts, (H, W), eps=1e-4)
        return yx / jnp.asarray([H, W], dtype=yx.dtype)

    out = jax.vmap(one)(preds["cam_rot"], preds["cam_trans"], preds["fov"], points)
    return jnp.nan_to_num(jnp.clip(out, -10.0, 10.0))


# ---------------------------------------------------------------------------
# loss engine
# ---------------------------------------------------------------------------


def _masked_mse(pred, target, mask=None):
    d = (pred - target) ** 2
    if mask is None:
        return jnp.mean(d)
    m = jnp.broadcast_to(mask, d.shape).astype(d.dtype)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def compute_sample_validity(
    kp_visibility: Optional[jnp.ndarray],
    sil_target: Optional[jnp.ndarray],
    min_visible_kps: int = 5,
    min_mask_coverage: float = 0.05,
):
    """Per-sample validity (reference _validate_sample_visibility:2769-2855):
    a sample contributes to image-space losses only with ≥5 visible keypoints
    and ≥5% silhouette coverage."""
    valid = None
    if kp_visibility is not None:
        valid = jnp.sum(kp_visibility > 0, axis=-1) >= min_visible_kps
    if sil_target is not None:
        cov_ok = jnp.mean(sil_target, axis=(-2, -1)) >= min_mask_coverage
        valid = cov_ok if valid is None else (valid & cov_ok)
    return valid


def compute_batch_loss(
    spec: ModelSpec,
    cfg: RegressorConfig,
    preds: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    loss_weights: Optional[Dict[str, float]] = None,
    image_size: Tuple[int, int] = (224, 224),
    availability: Optional[Dict[str, jnp.ndarray]] = None,
    joint_importance: Optional[jnp.ndarray] = None,
    render_silhouette_fn=None,
):
    """Weighted multi-component loss (reference compute_batch_loss:1285+).

    Args:
      preds: decoded predictions (see :func:`decode_predictions`).
      targets: dict with any of global_rot (N,3 axis-angle), joint_rot (N,P,3),
        betas, trans, fov, cam_rot (N,3,3), cam_trans, log_beta_scales,
        betas_trans, keypoints_2d (N,K,2 normalized yx), kp_visibility (N,K),
        keypoints_3d (N,K,3), silhouette (N,H,W).
      availability: per-sample {component: (N,) mask} for mixed datasets
        (reference _apply_availability_mask:2891).
      joint_importance: (K,) per-joint weights (reference :2932-3031).
      render_silhouette_fn: optional fn(verts (V,3), cam) → (H, W) alpha used
        for the silhouette BCE (injected so the Pallas path is chosen by the
        trainer).

    Returns (total, dict of weighted components).
    """
    w = dict(DEFAULT_LOSS_WEIGHTS, **(loss_weights or {}))
    avail = availability or {}
    objs: Dict[str, jnp.ndarray] = {}

    def amask(name):
        m = avail.get(name)
        return None if m is None else m[:, None]

    # --- parameter losses ---
    if w["global_rot"] > 0 and "global_rot" in targets:
        objs["global_rot"] = w["global_rot"] * _masked_mse(
            preds["global_rot"], targets["global_rot"], amask("pose")
        )
    if w["joint_rot"] > 0 and "joint_rot" in targets:
        m = avail.get("pose")
        vis = targets.get("kp_visibility")
        if vis is not None and vis.shape[-1] == preds["joint_rot"].shape[1] + 1:
            # per-joint visibility-weighted rotation loss (reference
            # _compute_visibility_aware_joint_rotation_loss, :3117-3268):
            # Frobenius distance between rotation matrices, averaged over the
            # VISIBLE non-root joints only
            from smilify_tpu.core.rotations import axis_angle_to_matrix

            pm = axis_angle_to_matrix(preds["joint_rot"])
            tm = axis_angle_to_matrix(targets["joint_rot"])
            ss = jnp.sum((pm - tm) ** 2, axis=(-2, -1))
            # double-where sqrt: exactly 0 at GT with a finite gradient
            per_joint = jnp.where(ss > 0, jnp.sqrt(jnp.where(ss > 0, ss, 1.0)), 0.0)
            jvis = vis[:, 1:].astype(per_joint.dtype)     # root excluded
            if m is not None:
                jvis = jvis * m[:, None]
            objs["joint_rot"] = w["joint_rot"] * (
                jnp.sum(per_joint * jvis) / jnp.maximum(jnp.sum(jvis), 1e-8)
            )
        else:
            mask = None if m is None else m[:, None, None]
            objs["joint_rot"] = w["joint_rot"] * _masked_mse(
                preds["joint_rot"], targets["joint_rot"], mask)
    if w["betas"] > 0 and "betas" in targets:
        objs["betas"] = w["betas"] * _masked_mse(preds["betas"], targets["betas"], amask("betas"))
    if w["trans"] > 0 and "trans" in targets:
        objs["trans"] = w["trans"] * _masked_mse(preds["trans"], targets["trans"], amask("trans"))
    if w["fov"] > 0 and "fov" in targets:
        objs["fov"] = w["fov"] * _masked_mse(preds["fov"], targets["fov"], avail.get("camera"))
    if w["cam_rot"] > 0 and "cam_rot" in targets:
        m = avail.get("camera")
        mask = None if m is None else m[:, None, None]
        objs["cam_rot"] = w["cam_rot"] * _masked_mse(preds["cam_rot"], targets["cam_rot"], mask)
    if w["cam_trans"] > 0 and "cam_trans" in targets:
        objs["cam_trans"] = w["cam_trans"] * _masked_mse(
            preds["cam_trans"], targets["cam_trans"], amask("camera")
        )
    for name in ("log_beta_scales", "betas_trans"):
        if w[name] > 0 and name in targets and name in preds:
            m = avail.get("scale_trans")
            mask = None if m is None else m[:, None, None]
            objs[name] = w[name] * _masked_mse(preds[name], targets[name], mask)

    # --- image-space losses ---
    needs_geometry = (
        (w["keypoint_2d"] > 0 and "keypoints_2d" in targets)
        or (w["keypoint_3d"] > 0 and "keypoints_3d" in targets)
        or (w["silhouette"] > 0 and "silhouette" in targets and render_silhouette_fn is not None)
    )
    if needs_geometry:
        verts, joints3d = forward_model(spec, preds, use_ue_scaling=cfg.use_ue_scaling)
        kp_vis = targets.get("kp_visibility")
        validity = compute_sample_validity(kp_vis, targets.get("silhouette"))

        if w["keypoint_2d"] > 0 and "keypoints_2d" in targets:
            kp_pred = project_to_camera(preds, joints3d, image_size)  # (N, K, 2) normalized
            vis = kp_vis if kp_vis is not None else jnp.ones(kp_pred.shape[:2])
            mask = vis[..., None]
            if validity is not None:
                mask = mask * validity[:, None, None]
            if joint_importance is not None:
                mask = mask * joint_importance[None, :, None]
            objs["keypoint_2d"] = w["keypoint_2d"] * _masked_mse(kp_pred, targets["keypoints_2d"], mask)

        if w["keypoint_3d"] > 0 and "keypoints_3d" in targets:
            mask = None
            if kp_vis is not None:
                mask = kp_vis[..., None]
            objs["keypoint_3d"] = w["keypoint_3d"] * _masked_mse(
                joints3d, targets["keypoints_3d"], mask
            )

        if w["silhouette"] > 0 and "silhouette" in targets and render_silhouette_fn is not None:
            def render_one(v, R, T, fov):
                cam = default_camera().replace(R=R, T=T, fov=fov)
                return render_silhouette_fn(v, cam)

            sil_pred = jax.vmap(render_one)(verts, preds["cam_rot"], preds["cam_trans"], preds["fov"])
            sil_t = targets["silhouette"]
            eps = 1e-6
            bce = -(sil_t * jnp.log(sil_pred + eps) + (1 - sil_t) * jnp.log(1 - sil_pred + eps))
            if validity is not None:
                bce = bce * validity[:, None, None]
            objs["silhouette"] = w["silhouette"] * jnp.mean(bce)

    # --- regularizers (reference :1806-1817 region) ---
    if w["joint_angle_regularization"] > 0:
        objs["joint_angle_regularization"] = w["joint_angle_regularization"] * jnp.mean(
            preds["joint_rot"] ** 2
        )
    if w["limb_scale_regularization"] > 0 and "log_beta_scales" in preds:
        objs["limb_scale_regularization"] = w["limb_scale_regularization"] * jnp.mean(
            preds["log_beta_scales"] ** 2
        )
    if w["limb_trans_regularization"] > 0 and "betas_trans" in preds:
        objs["limb_trans_regularization"] = w["limb_trans_regularization"] * jnp.mean(
            preds["betas_trans"] ** 2
        )

    total = sum(objs.values()) if objs else jnp.asarray(0.0)
    return total, objs
