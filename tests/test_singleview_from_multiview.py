"""Single-view-from-multiview dataset modes: expand_all_views flat index and
camera_centric recanonicalization (reference sleap_multiview_dataset.py:48,
67-72,298 — VERDICT round-1 gap #3).

The golden invariant (reference tests/test_singleview_from_multiview.py):
projecting the sample's 3D keypoints through the sample's camera must hit the
stored 2D keypoints — in camera_centric mode that camera is exactly the
renderer identity (R=I, T=0)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_h5(tmp_path_factory, stick_spec):
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    path = str(tmp_path_factory.mktemp("svmv") / "mv.h5")
    generate_synthetic_multiview(stick_spec, path, n_samples=4, n_views=3,
                                 resolution=64, render_images=False)
    return path


def _reproject_yx(sample, image_size):
    import jax.numpy as jnp

    from smilify_tpu.render.cameras import FoVCamera

    cam = FoVCamera(
        R=jnp.asarray(sample["cam_rot"].reshape(3, 3)),
        T=jnp.asarray(sample["cam_trans"]),
        fov=jnp.asarray(sample["fov"][0]),
        aspect_ratio=jnp.asarray(1.0),
        znear=1e-3, zfar=1e3,
    )
    return np.asarray(cam.project_points_yx(jnp.asarray(sample["keypoints_3d"]), image_size))


def test_expand_all_views_flat_index(synth_h5):
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    mv = MultiViewHDF5Dataset(synth_h5)
    sv = MultiViewHDF5Dataset(synth_h5, return_single_view=True, expand_all_views=True)
    total_views = sum(int(mv[i]["view_mask"].sum()) for i in range(len(mv)))
    assert len(sv) == total_views == 4 * 3
    assert sv.item_sample_indices.shape == (total_views,)

    s0 = sv[0]
    assert s0["image"].ndim == 3 and s0["keypoints_2d"].shape[1] == 2
    # all views of one sample share the body GT
    views_of_0 = [sv[i] for i in np.nonzero(sv.item_sample_indices == 0)[0]]
    for v in views_of_0[1:]:
        np.testing.assert_allclose(v["betas"], views_of_0[0]["betas"])
        np.testing.assert_allclose(v["keypoints_3d"], views_of_0[0]["keypoints_3d"])


def test_model_centric_reprojection(synth_h5):
    """Stored per-view camera params must reproject the shared 3D keypoints
    onto the sample's 2D keypoints — which the single-view reader exposes in
    the single-view convention: NORMALIZED (y, x) (models/regressor.py:311;
    the store itself keeps pixel (x, y))."""
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    sv = MultiViewHDF5Dataset(synth_h5, return_single_view=True, expand_all_views=True)
    for i in (0, 4, 7):
        s = sv[i]
        R = s["image"].shape[0]
        yx = _reproject_yx(s, (R, R))
        vis = s["keypoint_visibility"] > 0
        if vis.sum() == 0:
            continue
        np.testing.assert_allclose(yx[vis] / R, s["keypoints_2d"][vis], atol=0.1 / R)


def test_camera_centric_identity_camera_and_reprojection(synth_h5):
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    sv = MultiViewHDF5Dataset(synth_h5, return_single_view=True, expand_all_views=True,
                              camera_centric=True)
    svm = MultiViewHDF5Dataset(synth_h5, return_single_view=True, expand_all_views=True)
    for i in (0, 5):
        s = sv[i]
        # the camera is exactly the renderer identity
        np.testing.assert_allclose(s["cam_rot"].reshape(3, 3), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(s["cam_trans"], 0.0, atol=1e-6)
        # reprojection through the identity camera matches the sample's
        # normalized (y, x) 2D keypoints
        R = s["image"].shape[0]
        yx = _reproject_yx(s, (R, R))
        vis = s["keypoint_visibility"] > 0
        np.testing.assert_allclose(yx[vis] / R, s["keypoints_2d"][vis], atol=0.1 / R)
        # the transform is rigid: pairwise keypoint distances preserved
        a, b = s["keypoints_3d"], svm[i]["keypoints_3d"]
        nz = ~np.all(a == 0, axis=1) & ~np.all(b == 0, axis=1)
        da = np.linalg.norm(a[nz][:, None] - a[nz][None], axis=-1)
        db = np.linalg.norm(b[nz][:, None] - b[nz][None], axis=-1)
        np.testing.assert_allclose(da, db, atol=1e-4)


def test_grouped_split_no_view_leakage(synth_h5):
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset
    from smilify_tpu.train.trainer import split_dataset_grouped

    sv = MultiViewHDF5Dataset(synth_h5, return_single_view=True, expand_all_views=True)
    tr, va, te = split_dataset_grouped(sv.item_sample_indices, (0.5, 0.25, 0.25), seed=0)
    groups = sv.item_sample_indices
    tr_g, va_g, te_g = set(groups[tr]), set(groups[va]), set(groups[te])
    assert not (tr_g & va_g) and not (tr_g & te_g) and not (va_g & te_g)
    assert len(tr) + len(va) + len(te) == len(sv)
