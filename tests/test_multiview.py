"""Multi-view regressor tests: GT self-test for the multi-view loss and the
triangulation-consistency path, plus a module smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smilify_tpu.models.multiview import (
    MULTIVIEW_DEFAULT_LOSS_WEIGHTS,
    MultiViewConfig,
    MultiViewSMILRegressor,
    compute_multiview_batch_loss,
    decode_multiview_predictions,
    project_through_view_cameras,
)
from smilify_tpu.models.regressor import forward_model
from smilify_tpu.core.rotations import axis_angle_to_matrix
from smilify_tpu.render.cameras import default_camera


def _mv_gt_predictions(spec, n=2, v=3, seed=0):
    rng = np.random.RandomState(seed)
    P = spec.n_joints - 1
    # distinct plausible cameras per view: rotate about y, keep looking at origin
    Rs, Ts, fovs = [], [], []
    base = default_camera()
    for k in range(v):
        aa = jnp.asarray([0.0, 0.4 * k, 0.0])
        Rv = axis_angle_to_matrix(aa) @ base.R
        Rs.append(Rv)
        Ts.append(base.T + jnp.asarray([0.02 * k, 0.0, 0.1 * k]))
        fovs.append(55.0 + 3 * k)
    preds = {
        "global_rot": jnp.asarray(rng.randn(n, 3) * 0.2, dtype=jnp.float32),
        "joint_rot": jnp.asarray(rng.randn(n, P, 3) * 0.05, dtype=jnp.float32),
        "betas": jnp.asarray(rng.randn(n, spec.n_betas) * 0.3, dtype=jnp.float32),
        "trans": jnp.asarray(rng.randn(n, 3) * 0.05, dtype=jnp.float32),
        "view_fov": jnp.tile(jnp.asarray(fovs)[None], (n, 1)),
        "view_cam_rot": jnp.tile(jnp.stack(Rs)[None], (n, 1, 1, 1)),
        "view_cam_trans": jnp.tile(jnp.stack(Ts)[None], (n, 1, 1)),
    }
    return preds


def test_multiview_gt_losses_zero(stick_spec):
    spec = stick_spec
    cfg = MultiViewConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas, n_joints=spec.n_joints, max_views=3)
    preds = _mv_gt_predictions(spec)
    H = W = 128
    view_mask = jnp.ones((2, 3), dtype=bool)

    verts, joints3d = forward_model(spec, preds)
    kp2d = project_through_view_cameras(preds, joints3d, (H, W))

    targets = {
        "global_rot": preds["global_rot"],
        "joint_rot": preds["joint_rot"],
        "betas": preds["betas"],
        "trans": preds["trans"],
        "view_fov": preds["view_fov"],
        "view_cam_rot": preds["view_cam_rot"],
        "view_cam_trans": preds["view_cam_trans"],
        "keypoints_2d": kp2d,
        "kp_visibility": jnp.ones(kp2d.shape[:3]),
        "keypoints_3d": joints3d,
    }
    w = dict(MULTIVIEW_DEFAULT_LOSS_WEIGHTS, joint_angle_regularization=0.0)
    total, objs = compute_multiview_batch_loss(
        spec, cfg, preds, targets, view_mask, w, image_size=(H, W)
    )
    for k, v in objs.items():
        tol = 5e-5 if k == "triangulation_consistency" else 1e-7
        assert float(v) < tol, (k, float(v))


def test_triangulation_consistency_catches_bad_cameras(stick_spec):
    """Perturbing the predicted cameras must raise the triangulation loss."""
    spec = stick_spec
    cfg = MultiViewConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas, n_joints=spec.n_joints, max_views=3)
    preds = _mv_gt_predictions(spec)
    H = W = 128
    view_mask = jnp.ones((2, 3), dtype=bool)
    verts, joints3d = forward_model(spec, preds)
    kp2d = project_through_view_cameras(preds, joints3d, (H, W))
    targets = {"keypoints_2d": kp2d, "kp_visibility": jnp.ones(kp2d.shape[:3])}

    bad = dict(preds, view_cam_trans=preds["view_cam_trans"] + 0.2)
    w = {k: 0.0 for k in MULTIVIEW_DEFAULT_LOSS_WEIGHTS}
    w["triangulation_consistency"] = 1.0
    _, objs_good = compute_multiview_batch_loss(spec, cfg, preds, targets, view_mask, w, (H, W))
    _, objs_bad = compute_multiview_batch_loss(spec, cfg, bad, targets, view_mask, w, (H, W))
    assert float(objs_bad["triangulation_consistency"]) > 10 * float(
        objs_good["triangulation_consistency"]
    )


@pytest.mark.slow
def test_multiview_module_smoke(stick_spec):
    spec = stick_spec
    cfg = MultiViewConfig(
        backbone="unet_small",
        n_pose=spec.n_joints - 1,
        n_betas=spec.n_betas,
        n_joints=spec.n_joints,
        max_views=3,
        decoder_dim=64,
        decoder_depth=1,
        decoder_heads=2,
        fusion_heads=2,
        fusion_layers=1,
        ief_iters=1,
        camera_delta_mode=False,
    )
    model = MultiViewSMILRegressor(cfg)
    imgs = jnp.zeros((1, 3, 64, 64, 3))
    vm = jnp.asarray([[True, True, False]])
    cam_ids = jnp.asarray([[0, 1, 2]])
    variables = model.init(jax.random.PRNGKey(0), imgs, vm, cam_ids)
    (raw, hist), _ = model.apply(variables, imgs, vm, cam_ids, mutable=["batch_stats"])
    assert raw["cam_fov"].shape == (1, 3)
    assert raw["cam_rot6d"].shape == (1, 3, 6)
    preds = decode_multiview_predictions(cfg, raw, spec)
    assert preds["view_cam_rot"].shape == (1, 3, 3, 3)
    assert preds["joint_rot"].shape == (1, cfg.n_pose, 3)


def test_ignored_joints_change_keypoint_loss(stick_spec):
    """ignored_joints must drop those joints from the 2D supervision: a huge
    keypoint error on an ignored joint contributes nothing (reference
    ignored_joints, dataset_preprocessing.py:108-137 + config consumption)."""
    spec = stick_spec
    cfg = MultiViewConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas,
                          n_joints=spec.n_joints, max_views=3)
    preds = _mv_gt_predictions(spec)
    H = W = 64
    view_mask = jnp.ones((2, 3), dtype=bool)
    verts, joints3d = forward_model(spec, preds)
    kp2d = project_through_view_cameras(preds, joints3d, (H, W))
    # corrupt joint 5's 2D target everywhere
    kp2d_bad = kp2d.at[:, :, 5].add(10.0)
    vis = jnp.ones(kp2d.shape[:3])
    # zero visibility on joint 5 == what the trainers do for ignored_joints
    vis_ignored = vis.at[:, :, 5].set(0.0)

    targets = {
        "global_rot": preds["global_rot"], "joint_rot": preds["joint_rot"],
        "betas": preds["betas"], "trans": preds["trans"],
        "view_fov": preds["view_fov"], "view_cam_rot": preds["view_cam_rot"],
        "view_cam_trans": preds["view_cam_trans"],
        "keypoints_2d": kp2d_bad, "kp_visibility": vis, "keypoints_3d": joints3d,
    }
    w = {"keypoint_2d": 1.0}
    _, with_bad = compute_multiview_batch_loss(spec, cfg, preds, targets, view_mask, w, (H, W))
    targets["kp_visibility"] = vis_ignored
    _, ignored = compute_multiview_batch_loss(spec, cfg, preds, targets, view_mask, w, (H, W))
    assert float(with_bad["keypoint_2d"]) > 1.0
    assert float(ignored["keypoint_2d"]) < 1e-6

    # the config resolver maps names → indices
    from smilify_tpu.train.config import load_config, resolve_ignored_joint_indices

    name = list(spec.joint_names)[5]
    tcfg = load_config(None, overrides={
        "ignored_joints.enabled": True,
        "ignored_joints.ignored_joint_names": [name],
    }, mode="multi_view")
    assert resolve_ignored_joint_indices(tcfg, spec.joint_names) == [5]


def test_stored_dataset_gt_kp2d_loss_zero(stick_spec, tmp_path):
    """The STORE-to-LOSS convention chain: a written multiview HDF5 dataset,
    read back and fed through make_multiview_loss_fn with predictions set to
    the stored GT (body params + converted GT cameras), must yield ~0 2D
    keypoint loss. Pins the pixel-(x,y)-store -> normalized-(y,x)-loss
    conversion end-to-end (the round-3 axis-swap regression)."""
    import jax.numpy as jnp

    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset, collate_multiview
    from smilify_tpu.data.synthetic import generate_synthetic_multiview
    from smilify_tpu.models.multiview import MULTIVIEW_DEFAULT_LOSS_WEIGHTS
    from smilify_tpu.train.multiview_setup import batch_to_view_cams, make_multiview_loss_fn

    spec = stick_spec
    h5 = str(tmp_path / "conv.h5")
    generate_synthetic_multiview(spec, h5, n_samples=2, n_views=3, resolution=64,
                                 render_images=False, seed=3)
    ds = MultiViewHDF5Dataset(h5)
    batch = collate_multiview([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}
    H = W = 64

    cams = batch_to_view_cams(batch, (H, W))
    preds = {
        "global_rot": batch["global_rot"],
        "joint_rot": batch["joint_rot"],
        "betas": batch["betas"][..., : spec.n_betas],
        "trans": batch["trans"],
        **cams,
        "view_fov_raw": cams["view_fov"],
    }

    from smilify_tpu.models.multiview import MultiViewConfig

    cfg = MultiViewConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas,
                          n_joints=spec.n_joints, max_views=3)
    w = {k: 0.0 for k in MULTIVIEW_DEFAULT_LOSS_WEIGHTS}
    w["keypoint_2d"] = 1.0
    loss_fn = make_multiview_loss_fn(spec, cfg, w, (H, W))
    total, objs = loss_fn(preds, batch)
    # sub-pixel agreement: normalized MSE well under (1px/64)^2
    assert float(objs["keypoint_2d"]) < 2.5e-4, float(objs["keypoint_2d"])
