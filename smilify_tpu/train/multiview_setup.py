"""Shared glue for multi-view regressor training: apply_fn / loss_fn builders.

Factored out of the training CLI so the trainer, the multi-device harness
(`train/multidevice.py`), and the tests drive the exact same code path.
Covers the reference's model-forward + loss assembly
(train_multiview_regressor.py:560-660) including the GT-camera-init path
(use_gt_camera_init → CameraHead delta mode, reference CameraHead:175-340).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from smilify_tpu.core.rotations import matrix_to_rotation_6d
from smilify_tpu.render.cameras import camera_from_opencv


def batch_to_view_cams(batch: Dict[str, jnp.ndarray], image_size: Tuple[int, int]):
    """GT OpenCV cameras → our convention, vmapped over (batch, view).

    Returns the target dict consumed by compute_multiview_batch_loss
    (view_cam_rot (B,V,3,3), view_cam_trans (B,V,3), view_fov (B,V))."""
    H, W = image_size

    def one(Rcv, tcv, Kcv):
        cam = camera_from_opencv(Rcv, tcv, Kcv, (H, W))
        return cam.R, cam.T, cam.fov

    R, T, fov = jax.vmap(jax.vmap(one))(
        batch["camera_extrinsics_R"], batch["camera_extrinsics_t"], batch["camera_intrinsics"]
    )
    return {"view_cam_rot": R, "view_cam_trans": T, "view_fov": fov}


def gt_camera_init(batch: Dict[str, jnp.ndarray], image_size: Tuple[int, int]):
    """GT cameras in the raw-prediction parameterization (fov, rot6d, trans)
    for CameraHead delta mode (reference use_gt_camera_init)."""
    cams = batch_to_view_cams(batch, image_size)
    return {
        "fov": cams["view_fov"],
        "rot6d": matrix_to_rotation_6d(cams["view_cam_rot"]),
        "trans": cams["view_cam_trans"],
    }


def make_multiview_apply_fn(model, rcfg, spec, image_size: Tuple[int, int]):
    """Build ``apply_fn(variables, batch, train) -> (preds, new_batch_stats)``
    for make_train_step / make_eval_step. When the config enables camera
    delta mode, GT cameras from the batch initialize the camera head."""
    from smilify_tpu.models.multiview import decode_multiview_predictions

    def apply_fn(variables, batch, train):
        gt_cams = None
        if rcfg.camera_delta_mode and "camera_extrinsics_R" in batch:
            gt_cams = gt_camera_init(batch, image_size)
        (raw, hist), mutated = model.apply(
            variables, batch["images"], batch["view_mask"], batch["camera_indices"],
            gt_cameras=gt_cams,
            train=train, mutable=["batch_stats"] if train else [],
            rngs={"dropout": jax.random.PRNGKey(0)} if train else None,
        )
        preds = decode_multiview_predictions(rcfg, raw, spec)
        preds["ief_history"] = hist
        new_stats = mutated.get("batch_stats", variables.get("batch_stats", {})) if train else None
        return preds, new_stats

    return apply_fn


def make_multiview_loss_fn(spec, rcfg, weights: Dict[str, float],
                           image_size: Tuple[int, int],
                           joint_importance=None,
                           ignored_joint_indices=None):
    """Build ``loss_fn(preds, batch) -> (total, components)``.

    ``joint_importance`` is an optional (K,) per-joint weight array (see
    :func:`smilify_tpu.train.config.resolve_joint_importance`);
    ``ignored_joint_indices`` drops those joints from 2D supervision
    (reference ignored_joints, zeroed at preprocessing time)."""
    from smilify_tpu.models.multiview import compute_multiview_batch_loss

    H, W = image_size

    def loss_fn(preds, batch):
        gt_cams = batch_to_view_cams(batch, image_size)
        vis = batch["keypoint_visibility"]
        if ignored_joint_indices:
            vis = vis * jnp.ones(vis.shape[-1]).at[
                jnp.asarray(ignored_joint_indices)].set(0.0)
        targets = {
            "global_rot": batch["global_rot"],
            "joint_rot": batch["joint_rot"],
            "betas": batch["betas"][..., : spec.n_betas],
            "trans": batch["trans"],
            # store convention is pixel (x, y) (project_world_to_pixel;
            # validated in test_train_pipeline); the loss engine expects
            # normalized (y, x) (multiview.py:284) — swap axes THEN normalize
            "keypoints_2d": batch["keypoints_2d"][..., ::-1]
            / jnp.asarray([H, W], jnp.float32),
            "kp_visibility": vis,
            "keypoints_3d": batch["keypoints_3d"],
            **gt_cams,
        }
        return compute_multiview_batch_loss(
            spec, rcfg, preds, targets, batch["view_mask"], dict(weights),
            image_size=image_size,
            joint_importance=joint_importance,
        )

    return loss_fn
