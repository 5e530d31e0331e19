"""Tests for dataset merge/filter/scale-match and animation export."""

import numpy as np

from tests.test_data_pipeline import _make_mv_samples


def _write(tmp_path, name, n=3, v=2):
    from smilify_tpu.data.hdf5_dataset import write_multiview_hdf5

    path = str(tmp_path / name)
    write_multiview_hdf5(path, _make_mv_samples(n=n, v=v), max_views=v, target_resolution=32,
                         canonical_camera_order=[f"cam{i}" for i in range(v)], n_pose=10, n_betas=5)
    return path


def test_merge_datasets(tmp_path):
    from smilify_tpu.data.dataset_tools import merge_multiview_datasets
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    a = _write(tmp_path, "a.h5", n=3, v=2)
    b = _write(tmp_path, "b.h5", n=2, v=3)
    out = merge_multiview_datasets([a, b], str(tmp_path / "merged.h5"))
    ds = MultiViewHDF5Dataset(out)
    assert len(ds) == 5
    assert ds.max_views == 3
    s = ds[0]
    assert s["view_mask"].tolist() == [True, True, False]


def test_filter_dataset(tmp_path):
    import h5py

    from smilify_tpu.data.dataset_tools import filter_multiview_dataset
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    path = _write(tmp_path, "f.h5", n=4, v=2)
    # zero out visibility of sample 1's views → should be dropped
    with h5py.File(path, "r+") as f:
        v = f["multiview_keypoints/keypoint_visibility"][:]
        v[1] = 0.0
        f["multiview_keypoints/keypoint_visibility"][...] = v
    out, stats = filter_multiview_dataset(path, str(tmp_path / "filtered.h5"),
                                          min_visible_keypoints=5, min_views=1)
    assert stats["samples_dropped"] == 1
    ds = MultiViewHDF5Dataset(out)
    assert len(ds) == 3


def test_scale_match(tmp_path):
    import h5py

    from smilify_tpu.data.dataset_tools import (
        estimate_world_scale_ratio,
        match_scale_multiview_dataset,
    )

    a = _write(tmp_path, "sa.h5")
    b = _write(tmp_path, "sb.h5")
    with h5py.File(b, "r+") as f:
        t = f["multiview_keypoints/camera_extrinsics_t"][:]
        f["multiview_keypoints/camera_extrinsics_t"][...] = t / 27.0
    ratio = estimate_world_scale_ratio(a, b)
    assert abs(ratio - 27.0) < 1e-3
    out = match_scale_multiview_dataset(b, str(tmp_path / "scaled.h5"), ratio)
    assert abs(estimate_world_scale_ratio(a, out) - 1.0) < 1e-3


def test_animation_export_roundtrip(tmp_path):
    from smilify_tpu.utils.animation_export import AnimationRecorder, load_animation

    rng = np.random.RandomState(0)
    rec = AnimationRecorder(model_name="test", fps=24.0)
    for i in range(5):
        rec.add_frame(
            global_rot=rng.randn(3) * 0.2,
            joint_rot=rng.randn(10, 3) * 0.1,
            trans=rng.randn(3),
            betas=np.arange(5, dtype=np.float32),
        )
    path = rec.export(str(tmp_path / "anim"))
    data, sidecar = load_animation(path)
    assert data["poses"].shape == (5, 33)
    assert sidecar["schema_version"] == "1.1"
    assert sidecar["num_frames"] == 5
    np.testing.assert_allclose(data["betas"], np.arange(5), atol=1e-6)


def test_animation_export_normalizes_rotations(tmp_path):
    """6D and matrix inputs must be normalized to axis-angle on write."""
    import jax.numpy as jnp

    from smilify_tpu.core.rotations import axis_angle_to_matrix, axis_angle_to_rotation_6d
    from smilify_tpu.utils.animation_export import AnimationRecorder, load_animation

    aa_g = np.array([0.1, -0.2, 0.3], np.float32)
    aa_j = np.random.RandomState(1).randn(4, 3).astype(np.float32) * 0.3

    rec = AnimationRecorder()
    rec.add_frame(
        global_rot=np.asarray(axis_angle_to_rotation_6d(jnp.asarray(aa_g))),
        joint_rot=np.asarray(axis_angle_to_matrix(jnp.asarray(aa_j))),
        trans=np.zeros(3),
    )
    path = rec.export(str(tmp_path / "anim6d"))
    data, _ = load_animation(path)
    np.testing.assert_allclose(data["poses"][0, :3], aa_g, atol=1e-5)
    np.testing.assert_allclose(data["poses"][0, 3:].reshape(4, 3), aa_j, atol=1e-5)


def test_prediction_smoother():
    from smilify_tpu.utils.animation_export import PredictionSmoother

    x = np.zeros((7, 2))
    x[3] = 10.0  # spike
    sm = PredictionSmoother(window=3)
    y = sm.smooth(x)
    assert y[3, 0] < x[3, 0]  # spike attenuated
    assert y[2, 0] > 0 and y[4, 0] > 0  # spread to neighbors
    np.testing.assert_allclose(y.sum(0), x.sum(0), rtol=0.35)  # mass roughly preserved
