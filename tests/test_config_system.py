"""Config-system tests (mirroring the reference tests/test_config_system.py:
JSON loading, merge, validation errors, override precedence, curriculum/LR
resolution, round-trip serialization)."""

import json

import pytest

from smilify_tpu.train.config import (
    DEFAULT_BASE_WEIGHTS,
    TrainingConfig,
    config_from_dict,
    load_config,
)


@pytest.mark.smoke
def test_defaults_valid():
    cfg = TrainingConfig()
    cfg.validate()
    assert cfg.model.backbone_name == "vit_large_patch16_224"
    assert cfg.training.rotation_representation == "6d"


def test_json_load_and_merge(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "model": {"backbone_name": "resnet50", "head_type": "mlp"},
        "optimizer": {"learning_rate": 1e-4, "lr_schedule": {"0": 1e-4, "50": 5e-5}},
        "training": {"batch_size": 4},
    }))
    cfg = load_config(str(p))
    assert cfg.model.backbone_name == "resnet50"
    assert cfg.model.freeze_backbone is True  # default preserved
    assert cfg.training.batch_size == 4
    assert cfg.get_learning_rate_for_epoch(0) == 1e-4
    assert cfg.get_learning_rate_for_epoch(60) == 5e-5


def test_cli_override_precedence(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"optimizer": {"learning_rate": 1e-4}}))
    cfg = load_config(str(p), overrides={"optimizer.learning_rate": 3e-4})
    assert cfg.optimizer.learning_rate == 3e-4


def test_validation_errors():
    with pytest.raises(ValueError, match="rotation_representation"):
        load_config(overrides={"training.rotation_representation": "quaternion"})
    with pytest.raises(ValueError, match="split ratios"):
        load_config(overrides={"dataset.train_ratio": 0.5})
    with pytest.raises(ValueError, match="head_type"):
        load_config(overrides={"model.head_type": "rnn"})


def test_curriculum_resolution():
    cfg = config_from_dict({
        "loss_curriculum": {
            "base_weights": {"keypoint_2d": 0.0},
            "curriculum_stages": {
                "10": {"keypoint_2d": 0.1},
                "25": {"keypoint_2d": 0.2, "keypoint_3d": 1.0},
            },
        },
        "scale_trans_beta": {"mode": "ignore"},
    })
    assert cfg.get_loss_weights_for_epoch(0)["keypoint_2d"] == 0.0
    assert cfg.get_loss_weights_for_epoch(10)["keypoint_2d"] == 0.1
    assert cfg.get_loss_weights_for_epoch(30)["keypoint_2d"] == 0.2
    assert cfg.get_loss_weights_for_epoch(30)["keypoint_3d"] == 1.0
    # scale_trans mode forces the scale/trans weights
    assert cfg.get_loss_weights_for_epoch(0)["log_beta_scales"] == 0.0


def test_scale_trans_mode_weights():
    cfg = config_from_dict({"scale_trans_beta": {"mode": "separate"}})
    assert cfg.get_loss_weights_for_epoch(0)["log_beta_scales"] == 0.1


def test_round_trip(tmp_path):
    cfg = TrainingConfig()
    cfg.optimizer.learning_rate = 7e-5
    p = tmp_path / "out.json"
    cfg.save(str(p))
    cfg2 = load_config(str(p))
    assert cfg2.optimizer.learning_rate == 7e-5
    assert cfg2.loss_curriculum.base_weights == cfg.loss_curriculum.base_weights


@pytest.mark.smoke
def test_base_weights_match_reference_defaults():
    assert DEFAULT_BASE_WEIGHTS["keypoint_2d"] == 0.1
    assert DEFAULT_BASE_WEIGHTS["keypoint_3d"] == 0.25
    assert DEFAULT_BASE_WEIGHTS["limb_trans_regularization"] == 1


def test_unknown_fields_ignored():
    cfg = config_from_dict({"model": {"backbone_name": "resnet50", "bogus_field": 1}})
    assert cfg.model.backbone_name == "resnet50"


def test_regressor_config_resolution(stick_spec):
    cfg = config_from_dict({
        "model": {"backbone_name": "resnet50", "head_type": "transformer_decoder"},
        "mode": "multi_view",
        "multiview": {"num_views_to_use": 5},
    })
    rc = cfg.regressor_config(stick_spec)
    assert rc.max_views == 5
    assert rc.n_joints == stick_spec.n_joints
    assert rc.backbone == "resnet50"


def test_wired_config_fields_change_behavior(tmp_path, stick_spec):
    """Round-2 audit: formerly-dead config fields now have consumers."""
    import jax.numpy as jnp

    from smilify_tpu.train.config import load_config

    # use_mixed_precision → compute dtype
    cfg = load_config(None, overrides={"training.use_mixed_precision": False})
    assert cfg.regressor_config(stick_spec).compute_dtype == jnp.float32
    cfg = load_config(None, overrides={"training.use_mixed_precision": True})
    assert cfg.regressor_config(stick_spec).compute_dtype == jnp.bfloat16

    # transformer_dim_head/mlp_dim/trans_scale_factor → decoder config
    cfg = load_config(None, overrides={
        "model.transformer_heads": 4, "model.transformer_dim_head": 32,
        "model.transformer_mlp_dim": 77, "model.transformer_trans_scale_factor": 0.5,
    })
    rc = cfg.regressor_config(stick_spec)
    assert rc.decoder_dim == 128 and rc.decoder_mlp_dim == 77
    assert rc.trans_scale_factor == 0.5

    # mesh_scaling → output group + decode
    cfg = load_config(None, overrides={"mesh_scaling.allow_mesh_scaling": True})
    rc = cfg.regressor_config(stick_spec)
    assert ("mesh_scale", 1) in rc.group_dims()

    # optimizer_type → optax choice ('bogus' rejected)
    import pytest as _pytest

    from smilify_tpu.train.trainer import build_optimizer

    cfg = load_config(None, overrides={"optimizer.optimizer_type": "adam"})
    build_optimizer(cfg, 1e-4, False)
    cfg = load_config(None, overrides={"optimizer.optimizer_type": "bogus"})
    with _pytest.raises(ValueError):
        build_optimizer(cfg, 1e-4, False)


def test_shape_family_bakes_cluster_mean(tmp_path, stick_spec):
    """shape_family >= 0 bakes the family cluster-mean betas into the
    template (reference smal_torch.py:133-139)."""
    import pickle

    import numpy as np

    from smilify_tpu.core.spec import load_model_spec
    from tests.conftest import STICK_PKL

    B = stick_spec.n_betas
    cluster_means = np.zeros((3, B))
    cluster_means[1, 0] = 2.0  # family 1 shifts along beta 0
    data_file = tmp_path / "smal_data.pkl"
    with open(data_file, "wb") as f:
        pickle.dump({"cluster_means": cluster_means}, f)

    base = load_model_spec(STICK_PKL, align_symmetry=False)
    fam = load_model_spec(STICK_PKL, align_symmetry=False, shape_family=1,
                          smal_data_file=str(data_file))
    diff = np.abs(np.asarray(fam.v_template) - np.asarray(base.v_template)).max()
    assert diff > 1e-4  # template moved
    # family 0 (zero means) leaves the template unchanged
    fam0 = load_model_spec(STICK_PKL, align_symmetry=False, shape_family=0,
                           smal_data_file=str(data_file))
    np.testing.assert_allclose(np.asarray(fam0.v_template), np.asarray(base.v_template),
                               atol=1e-6)


def test_mesh_scale_forward_and_decode(stick_spec):
    """allow_mesh_scaling: decode produces mesh_scale and forward_model
    re-anchors at the root and scales (reference smil_image_regressor.py:2677)."""
    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.models.regressor import RegressorConfig, decode_predictions, forward_model

    spec = stick_spec
    cfg = RegressorConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas,
                          n_joints=spec.n_joints, allow_mesh_scaling=True)
    rot = 6
    raw = {
        "global_rot": jnp.tile(jnp.asarray([1., 0, 0, 0, 1., 0])[None], (1, 1)),
        "joint_rot": jnp.tile(jnp.asarray([1., 0, 0, 0, 1., 0])[None, None], (1, cfg.n_pose, 1)).reshape(1, -1),
        "betas": jnp.zeros((1, spec.n_betas)),
        "trans": jnp.zeros((1, 3)),
        "fov": jnp.full((1, 1), 60.0),
        "cam_rot": jnp.asarray([[1., 0, 0, 0, 1., 0, 0, 0, 1.]]),
        "cam_trans": jnp.zeros((1, 3)),
        "mesh_scale": jnp.asarray([[np.log(2.0)]]),  # log-scale → ×2
    }
    preds = decode_predictions(cfg, raw, spec)
    np.testing.assert_allclose(float(preds["mesh_scale"][0]), 2.0, rtol=1e-6)

    v2, j2 = forward_model(spec, preds)
    preds1 = dict(preds, mesh_scale=jnp.asarray([1.0]))
    v1, j1 = forward_model(spec, preds1)
    # pairwise distances double under mesh_scale 2 (rigid re-anchoring aside)
    d1 = float(jnp.linalg.norm(j1[0, 1] - j1[0, 2]))
    d2 = float(jnp.linalg.norm(j2[0, 1] - j2[0, 2]))
    np.testing.assert_allclose(d2, 2 * d1, rtol=1e-4)
