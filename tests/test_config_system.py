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
