"""Neural regressor tests.

The key gate is the ground-truth self-test (reference
test_smil_regressor_ground_truth.py): with predictions set to ground truth,
every loss component must be ≈ 0 — validating the loss/render/param mapping
chain end-to-end without any learning.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smilify_tpu.models.regressor import (
    DEFAULT_LOSS_WEIGHTS,
    RegressorConfig,
    SMILRegressor,
    compute_batch_loss,
    decode_predictions,
    forward_model,
    project_to_camera,
)
from smilify_tpu.core.rotations import axis_angle_to_matrix, matrix_to_rotation_6d
from smilify_tpu.render.cameras import default_camera


def _gt_predictions(spec, n=2, seed=0):
    rng = np.random.RandomState(seed)
    P = spec.n_joints - 1
    preds = {
        "global_rot": jnp.asarray(rng.randn(n, 3) * 0.2, dtype=jnp.float32),
        "joint_rot": jnp.asarray(rng.randn(n, P, 3) * 0.05, dtype=jnp.float32),
        "betas": jnp.asarray(rng.randn(n, spec.n_betas) * 0.3, dtype=jnp.float32),
        "trans": jnp.asarray(rng.randn(n, 3) * 0.05, dtype=jnp.float32),
        "fov": jnp.full((n,), 60.0),
        "cam_rot": jnp.tile(default_camera().R[None], (n, 1, 1)),
        "cam_trans": jnp.tile(default_camera().T[None], (n, 1)),
    }
    return preds


@pytest.mark.smoke
def test_ground_truth_losses_are_zero(stick_spec):
    """predictions := GT ⇒ all loss components ≈ 0."""
    spec = stick_spec
    cfg = RegressorConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas, n_joints=spec.n_joints)
    preds = _gt_predictions(spec)
    H = W = 128

    verts, joints3d = forward_model(spec, preds)
    kp2d = project_to_camera(preds, joints3d, (H, W))

    targets = {
        "global_rot": preds["global_rot"],
        "joint_rot": preds["joint_rot"],
        "betas": preds["betas"],
        "trans": preds["trans"],
        "fov": preds["fov"],
        "cam_rot": preds["cam_rot"],
        "cam_trans": preds["cam_trans"],
        "keypoints_2d": kp2d,
        "kp_visibility": jnp.ones(kp2d.shape[:2]),
        "keypoints_3d": joints3d,
    }
    weights = dict(DEFAULT_LOSS_WEIGHTS, keypoint_2d=1.0, keypoint_3d=1.0,
                   joint_angle_regularization=0.0, limb_scale_regularization=0.0,
                   limb_trans_regularization=0.0)
    total, objs = compute_batch_loss(spec, cfg, preds, targets, weights, image_size=(H, W))
    for k, v in objs.items():
        assert float(v) < 1e-8, (k, float(v))
    assert float(total) < 1e-7


def test_loss_nonzero_for_wrong_predictions(stick_spec):
    spec = stick_spec
    cfg = RegressorConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas, n_joints=spec.n_joints)
    preds = _gt_predictions(spec, seed=0)
    wrong = _gt_predictions(spec, seed=1)
    H = W = 128
    verts, joints3d = forward_model(spec, preds)
    targets = {
        "global_rot": preds["global_rot"],
        "joint_rot": preds["joint_rot"],
        "keypoints_2d": project_to_camera(preds, joints3d, (H, W)),
        "kp_visibility": jnp.ones((2, joints3d.shape[1])),
    }
    weights = dict(DEFAULT_LOSS_WEIGHTS, keypoint_2d=1.0)
    total, objs = compute_batch_loss(spec, cfg, wrong, targets, weights, image_size=(H, W))
    assert float(objs["global_rot"]) > 1e-4
    assert float(objs["keypoint_2d"]) > 1e-6


def test_sample_validity_filter(stick_spec):
    from smilify_tpu.models.regressor import compute_sample_validity

    vis = jnp.asarray([[1] * 10 + [0] * 45, [1] * 3 + [0] * 52])  # sample 1: only 3 visible
    sil = jnp.stack([jnp.ones((16, 16)) * 0.5, jnp.zeros((16, 16))])
    valid = compute_sample_validity(vis, sil)
    assert bool(valid[0]) is True
    assert bool(valid[1]) is False


@pytest.mark.slow
def test_regressor_forward_smoke(stick_spec):
    """Tiny regressor initializes and runs; head outputs have the right dims."""
    spec = stick_spec
    cfg = RegressorConfig(
        backbone="unet_small",
        head_type="transformer",
        n_pose=spec.n_joints - 1,
        n_betas=spec.n_betas,
        n_joints=spec.n_joints,
        decoder_dim=64,
        decoder_depth=1,
        decoder_heads=2,
        ief_iters=2,
    )
    model = SMILRegressor(cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    (raw, history), _ = model.apply(variables, imgs, train=False, mutable=["batch_stats"])
    assert raw["global_rot"].shape == (2, 6)
    assert raw["joint_rot"].shape == (2, cfg.n_pose * 6)
    assert len(history) == 2

    preds = decode_predictions(cfg, raw, spec)
    assert preds["joint_rot"].shape == (2, cfg.n_pose, 3)
    # decoded global rotation should be near identity at init (zero-init heads)
    R = axis_angle_to_matrix(preds["global_rot"])
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-3)


def test_mlp_head_smoke(stick_spec):
    spec = stick_spec
    cfg = RegressorConfig(
        backbone="unet_small", head_type="mlp",
        n_pose=spec.n_joints - 1, n_betas=spec.n_betas, n_joints=spec.n_joints,
        mlp_hidden=64,
    )
    from smilify_tpu.models.transformer_decoder import MLPHead

    head = MLPHead(group_dims=cfg.group_dims(), hidden=32, n_pose=cfg.n_pose)
    vars_ = head.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    out, _ = head.apply(vars_, jnp.zeros((2, 16)))
    assert out["betas"].shape == (2, spec.n_betas)
    # zero-init kernel + identity bias ⇒ 6D identity at init
    np.testing.assert_allclose(np.asarray(out["global_rot"][0]), [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_visibility_weighted_joint_rotation_loss(stick_spec):
    """Rotation error on an INVISIBLE joint must not contribute (reference
    smil_image_regressor.py:3117-3268)."""
    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.models.regressor import RegressorConfig, compute_batch_loss

    spec = stick_spec
    cfg = RegressorConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas,
                          n_joints=spec.n_joints)
    N, P = 2, spec.n_joints - 1
    rng = np.random.RandomState(0)
    jr = jnp.asarray(rng.randn(N, P, 3) * 0.1, jnp.float32)
    preds = {"joint_rot": jr, "global_rot": jnp.zeros((N, 3)),
             "betas": jnp.zeros((N, spec.n_betas)), "trans": jnp.zeros((N, 3)),
             "fov": jnp.full((N,), 60.0),
             "cam_rot": jnp.tile(jnp.eye(3)[None], (N, 1, 1)),
             "cam_trans": jnp.zeros((N, 3))}
    # corrupt joint 3's rotation in the target
    jr_bad = jr.at[:, 3].add(1.0)
    vis_all = jnp.ones((N, spec.n_joints))
    vis_hide = vis_all.at[:, 4].set(0.0)  # joint_rot index 3 ↔ visibility index 4

    w = {"joint_rot": 1.0}
    _, with_err = compute_batch_loss(spec, cfg, preds,
                                     {"joint_rot": jr_bad, "kp_visibility": vis_all},
                                     w, image_size=(64, 64))
    _, hidden = compute_batch_loss(spec, cfg, preds,
                                   {"joint_rot": jr_bad, "kp_visibility": vis_hide},
                                   w, image_size=(64, 64))
    assert float(with_err["joint_rot"]) > 0.01
    assert float(hidden["joint_rot"]) < 1e-5
    # perfect prediction → ~0 either way
    _, perfect = compute_batch_loss(spec, cfg, preds,
                                    {"joint_rot": jr, "kp_visibility": vis_all},
                                    w, image_size=(64, 64))
    assert float(perfect["joint_rot"]) < 1e-5


def test_groupnorm_resnet_variant():
    """resnet50_gn: same topology/param shapes as resnet50 but GroupNorm(32) —
    no batch_stats collection at all, so training needs no statistics passes
    and gradient accumulation is exactly equivalent (the recommended TPU
    training backbone, docs/PERFORMANCE.md §Training MFU)."""
    import jax
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import create_backbone

    model, dim = create_backbone("resnet50_gn", dtype=jnp.float32)
    assert dim == 2048
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=True)
    assert "batch_stats" not in variables
    feats, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert not mutated  # nothing to mutate: no running statistics
    assert feats.pooled.shape == (1, 2048)

    bn_model, _ = create_backbone("resnet50", dtype=jnp.float32)
    bn_vars = bn_model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=True)
    n_gn = sum(x.size for x in jax.tree.leaves(variables["params"]))
    n_bn = sum(x.size for x in jax.tree.leaves(bn_vars["params"]))
    assert n_gn == n_bn  # scale+bias per channel either way


def test_ue_scaling_convention_and_config_routing(stick_spec):
    """replicAnt-convention models: dataset.use_ue_scaling must reach the
    regressor config, and forward_model must apply (mesh-root)*10+trans.
    Round-4 regression: benchmark_model/run_inference dropped the flag and
    silently evaluated UE-convention models in model units (10x off)."""
    import jax.numpy as jnp
    import numpy as np

    from smilify_tpu.models.regressor import forward_model
    from smilify_tpu.train.config import load_config

    cfg = load_config(None, overrides={"dataset.use_ue_scaling": True},
                      mode="single_view")
    rcfg = cfg.regressor_config(stick_spec)
    assert rcfg.use_ue_scaling is True

    spec = stick_spec
    preds = {
        "global_rot": jnp.zeros((1, 3)),
        "joint_rot": jnp.zeros((1, spec.n_joints - 1, 3)),
        "betas": jnp.zeros((1, spec.n_betas)),
        "trans": jnp.asarray([[0.5, -0.2, 3.0]]),
        "fov": jnp.asarray([60.0]),
    }
    v0, j0 = forward_model(spec, preds, use_ue_scaling=False)
    v1, j1 = forward_model(spec, preds, use_ue_scaling=True)
    # UE convention: verts = (verts0 - trans - root)*10 + trans
    root = j0[:, :1, :] - preds["trans"][:, None, :]
    want = (v0 - preds["trans"][:, None, :] - root) * 10.0 + preds["trans"][:, None, :]
    np.testing.assert_allclose(np.asarray(v1), np.asarray(want), atol=1e-4)
    ext0 = np.asarray(v0.max(axis=1) - v0.min(axis=1))
    ext1 = np.asarray(v1.max(axis=1) - v1.min(axis=1))
    np.testing.assert_allclose(ext1, ext0 * 10.0, rtol=1e-5)
