"""Fitter completeness: per-frame checkpoint reload round-trip and the
prior-selection flags (reference fitter.py:352-371 load_checkpoint;
fitter.py:86-107 use_unity_prior / walking prior)."""

import pickle

import numpy as np
import pytest


def test_checkpoint_export_reload_roundtrip(tmp_path):
    from smilify_tpu.utils.export import ImageExporter, load_fitter_checkpoint

    filenames = ["frame_a.jpg", "frame_b.jpg"]
    exporter = ImageExporter(str(tmp_path), filenames)
    exporter.stage_id = 3
    exporter.epoch_name = "42"

    rng = np.random.RandomState(0)
    per_frame = []
    for i in range(2):
        params = {
            "global_rotation": rng.randn(3).astype(np.float32),
            "joint_rotations": rng.randn(7, 3).astype(np.float32),
            "betas": np.arange(5, dtype=np.float32),
            "trans": rng.randn(3).astype(np.float32),
            "fov": np.float32(55.0 + i),
            "log_betascale": rng.randn(8, 3).astype(np.float32),
            "betas_trans": rng.randn(8, 3).astype(np.float32),
        }
        per_frame.append(params)
        exporter.export(np.zeros((4, 4, 3)), i, params)

    ck = load_fitter_checkpoint(str(tmp_path), filenames, stage=3, epoch="42")
    np.testing.assert_allclose(ck["global_rot"][1], per_frame[1]["global_rotation"])
    np.testing.assert_allclose(ck["joint_rot"][0], per_frame[0]["joint_rotations"])
    np.testing.assert_allclose(ck["fov"], [55.0, 56.0])
    np.testing.assert_allclose(ck["betas"], per_frame[0]["betas"])
    np.testing.assert_allclose(ck["log_beta_scales"], per_frame[0]["log_betascale"])


def test_prior_flags_reach_fitter(tmp_path, stick_spec):
    """--unity-prior / --walking-prior construct priors the fitter consumes."""
    import jax.numpy as jnp

    from smilify_tpu.fitter.fitter import FitData, SmalFitter
    from smilify_tpu.fitter.priors import unity_shape_prior, walking_pose_prior

    spec = stick_spec
    B = spec.n_betas
    rng = np.random.RandomState(1)

    # synthetic unity prior: mean/cov over (B betas + 6 scales + 1 extra col)
    n = B + 7
    cov = np.eye(n) * 0.5
    np.savez(tmp_path / "unity.npz", mean=rng.randn(n).astype(np.float64), cov=cov)
    sp = unity_shape_prior(str(tmp_path / "unity.npz"))
    assert sp.mean_betas.shape[0] == n - 1

    # synthetic walking prior pkl: mean_pose over (J-1)*3, precision over J*3
    J = spec.n_joints
    pose_dim = J * 3
    with open(tmp_path / "walking.pkl", "wb") as f:
        pickle.dump({"mean_pose": rng.randn(pose_dim - 3),
                     "pic": np.eye(pose_dim)}, f)
    pp = walking_pose_prior(str(tmp_path / "walking.pkl"))
    theta = jnp.zeros((2, J, 3))
    val = pp(theta)
    assert np.isfinite(np.asarray(val)).all()

    # the fitter accepts injected priors (the CLI wiring path)
    data = FitData(
        rgb=None,
        sil=None,
        joints=jnp.zeros((1, J, 2)),
        visibility=jnp.ones((1, J)),
    )
    fitter = SmalFitter(spec, data, (32, 32), pose_prior=pp)
    assert fitter.pose_prior is pp


def test_synthetic_fit_data_is_reachable_and_deterministic():
    """The benchmark fit target (rendered-GT silhouette + projected joints)
    must look like the production workload: a real on-screen silhouette with
    sane coverage, joints inside the image, finite everywhere, and
    deterministic per seed (bench comparability across rounds)."""
    from smilify_tpu.fitter.fitter import synthetic_fit_data
    from smilify_tpu.train.multidevice import toy_model_spec

    spec = toy_model_spec()
    H = W = 64
    d1 = synthetic_fit_data(spec, 2, (H, W), seed=7)
    d2 = synthetic_fit_data(spec, 2, (H, W), seed=7)

    sil = np.asarray(d1.sil)
    assert sil.shape == (2, H, W)
    assert np.isfinite(sil).all()
    assert set(np.unique(sil)) <= {0.0, 1.0}  # binary GT mask
    cov = sil.mean(axis=(1, 2))
    assert (cov > 0.005).all() and (cov < 0.6).all(), cov  # on-screen, not wall-to-wall

    joints = np.asarray(d1.joints)
    assert np.isfinite(joints).all()
    # most joints project inside the image (root-ish joints can clip edges)
    inside = ((joints >= 0) & (joints < H)).all(axis=-1).mean()
    assert inside > 0.8, inside

    np.testing.assert_array_equal(sil, np.asarray(d2.sil))
    np.testing.assert_array_equal(joints, np.asarray(d2.joints))
    # a different seed gives a different target
    d3 = synthetic_fit_data(spec, 2, (H, W), seed=8)
    assert not np.array_equal(np.asarray(d3.joints), joints)
