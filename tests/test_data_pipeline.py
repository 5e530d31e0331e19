"""Data-pipeline tests: HDF5 schema round-trip, canonical-frame round-trip,
augmentation reprojection invariants (patterns from the reference
tests/test_augmentation.py and docs/design/multiview_replicant_integration.md)."""

import numpy as np
import pytest

from smilify_tpu.data.augmentation import (
    AugmentationParams,
    augment_multiview_sample,
    geometric_scale_jitter,
    photometric_augment,
)
from smilify_tpu.data.canonical_frame import (
    canonicalize_sample,
    decanonicalize_points,
    infer_world_scale,
    project_world_to_pixel,
)
from smilify_tpu.data.hdf5_dataset import (
    MultiViewHDF5Dataset,
    SingleViewHDF5Dataset,
    collate_multiview,
    detect_dataset_type,
    write_multiview_hdf5,
    write_singleview_hdf5,
)


def _make_mv_samples(n=3, v=2, k=8, res=32, rng=None):
    rng = rng or np.random.RandomState(0)
    # smooth gradient images (JPEG-friendly; pure noise is a worst case)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    samples = []
    for i in range(n):
        nv = v if i % 2 == 0 else max(1, v - 1)  # variable view counts
        samples.append({
            "images": [
                (np.stack([yy, xx, yy * xx], -1) * 200 + 20).astype(np.uint8)
                for _ in range(nv)
            ],
            "camera_indices": list(range(nv)),
            "keypoints_2d": rng.rand(nv, k, 2).astype(np.float32),
            "keypoint_visibility": np.ones((nv, k), np.float32),
            "camera_intrinsics": np.tile(np.eye(3, dtype=np.float32) * 100, (nv, 1, 1)),
            "camera_extrinsics_R": np.tile(np.eye(3, dtype=np.float32), (nv, 1, 1)),
            "camera_extrinsics_t": rng.rand(nv, 3).astype(np.float32),
            "image_sizes": np.full((nv, 2), res, np.int32),
            "keypoints_3d": rng.rand(k, 3).astype(np.float32),
            "global_rot": rng.rand(3).astype(np.float32),
            "joint_rot": rng.rand(10, 3).astype(np.float32),
            "betas": rng.rand(5).astype(np.float32),
            "trans": rng.rand(3).astype(np.float32),
            "session_name": f"sess{i}",
            "frame_idx": i,
        })
    return samples


@pytest.mark.smoke
def test_multiview_hdf5_roundtrip(tmp_path):
    path = str(tmp_path / "mv.h5")
    samples = _make_mv_samples()
    write_multiview_hdf5(path, samples, max_views=2, target_resolution=32,
                         canonical_camera_order=["cam0", "cam1"], n_pose=10, n_betas=5)

    assert detect_dataset_type(path) == "sleap_multiview"
    ds = MultiViewHDF5Dataset(path)
    assert len(ds) == 3
    s0 = ds[0]
    assert s0["images"].shape == (2, 32, 32, 3)
    assert s0["view_mask"].tolist() == [True, True]
    s1 = ds[1]
    assert s1["view_mask"].tolist() == [True, False]
    np.testing.assert_allclose(s0["keypoints_2d"][0], samples[0]["keypoints_2d"][0], atol=1e-6)
    np.testing.assert_allclose(s0["betas"], samples[0]["betas"], atol=1e-6)
    # JPEG is lossy but close
    assert np.abs(s0["images"][0] - samples[0]["images"][0] / 255.0).mean() < 0.02

    batch = collate_multiview([ds[0], ds[1], ds[2]])
    assert batch["images"].shape == (3, 2, 32, 32, 3)
    assert batch["view_mask"].shape == (3, 2)
    ds.close()


def test_singleview_hdf5_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "sv.h5")
    samples = [
        {
            "image": (rng.rand(32, 32, 3) * 255).astype(np.uint8),
            "keypoints_2d": rng.rand(8, 2).astype(np.float32),
            "keypoint_visibility": np.ones(8, np.float32),
            "global_rot": rng.rand(3).astype(np.float32),
            "betas": rng.rand(5).astype(np.float32),
            "silhouette": (rng.rand(32, 32) > 0.5).astype(np.float32),
        }
        for _ in range(2)
    ]
    write_singleview_hdf5(path, samples, 32, n_pose=10, n_betas=5)
    assert detect_dataset_type(path) == "optimized_hdf5"
    ds = SingleViewHDF5Dataset(path)
    s = ds[0]
    np.testing.assert_allclose(s["global_rot"], samples[0]["global_rot"], atol=1e-6)
    assert s["silhouette"].shape == (32, 32)
    # silhouette survives JPEG thresholding
    assert (s["silhouette"] == samples[0]["silhouette"]).mean() > 0.9


@pytest.mark.smoke
def test_canonicalize_roundtrip():
    rng = np.random.RandomState(1)
    V, K = 4, 12
    from smilify_tpu.core.rotations import axis_angle_to_matrix
    import jax.numpy as jnp

    R = np.stack([np.asarray(axis_angle_to_matrix(jnp.asarray(rng.randn(3) * 0.5))) for _ in range(V)])
    t = rng.randn(V, 3)
    kp3d = rng.randn(K, 3)
    kp3d[3] = 0.0  # sentinel row
    mask = np.array([False, True, True, True])

    R2, t2, kp2, R0, t0, v0 = canonicalize_sample(R, t, kp3d, mask)
    assert v0 == 1
    np.testing.assert_allclose(R2[1], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(t2[1], 0.0, atol=1e-6)
    # sentinel preserved
    np.testing.assert_array_equal(kp2[3], 0.0)

    # reprojection invariance for each valid view
    Kmat = np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
    shift = np.array([0, 0, 5.0])  # keep points in front of cameras
    for v in (1, 2, 3):
        uv_orig = project_world_to_pixel(kp3d[:3] + shift, R[v], t[v] + R[v] @ shift * 0, Kmat)
        # transform the shifted points through the same canonicalization
        R2s, t2s, kp2s, R0s, t0s, _ = canonicalize_sample(R, t, kp3d[:3] + shift, mask)
        uv_can = project_world_to_pixel(kp2s, R2s[v], t2s[v], Kmat)
        np.testing.assert_allclose(uv_can, uv_orig, atol=1e-3)  # f32 R round-trip noise

    # inverse round-trip
    back = decanonicalize_points(kp2, R0, t0)
    np.testing.assert_allclose(back[:3], kp3d[:3], atol=1e-5)  # f32 R0
    np.testing.assert_array_equal(back[3], 0.0)


def test_world_scale_heuristic():
    t_mm = np.random.RandomState(0).rand(4, 3) * 500 + 100
    assert infer_world_scale(t_mm, np.ones(4, bool)) == 0.001
    t_m = np.random.RandomState(0).rand(4, 3)
    assert infer_world_scale(t_m, np.ones(4, bool)) == 1.0


def test_photometric_preserves_geometry_and_determinism():
    rng = np.random.RandomState(2)
    img = rng.rand(32, 32, 3).astype(np.float32)
    p = AugmentationParams()
    out1 = photometric_augment(img, np.random.default_rng(7), p)
    out2 = photometric_augment(img, np.random.default_rng(7), p)
    np.testing.assert_array_equal(out1, out2)  # seeded determinism
    assert out1.shape == img.shape
    assert out1.min() >= 0.0 and out1.max() <= 1.0
    assert not np.allclose(out1, img)


def test_geometric_jitter_reprojection_consistency():
    """3D points projected through the UPDATED K must land on the transformed
    pixel keypoints (the reference's core augmentation invariant)."""
    rng = np.random.default_rng(3)
    H = W = 64
    f = 80.0
    K = np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1.0]])
    pts3d = np.random.RandomState(0).randn(10, 3) * 0.2 + [0, 0, 3.0]
    uv = pts3d[:, :2] / pts3d[:, 2:3] * f + [(W - 1) / 2, (H - 1) / 2]

    img = np.zeros((H, W, 3), np.float32)
    p = AugmentationParams(geometric_enabled=True, scale_jitter_range=(0.8, 1.2))
    _, K_new, uv_new = geometric_scale_jitter(img, K, rng, p, keypoints_xy=uv)

    uv_reproj = pts3d[:, :2] / pts3d[:, 2:3] * np.array([K_new[0, 0], K_new[1, 1]]) + K_new[:2, 2]
    np.testing.assert_allclose(uv_reproj, uv_new, atol=1e-6)


def test_crop_jitter_reprojection_consistency():
    """Crop jitter shifts principal point + keypoints by the same offset, so
    reprojection through the updated K stays exact."""
    from smilify_tpu.data.augmentation import geometric_crop_jitter

    rng = np.random.default_rng(11)
    H = W = 64
    f = 80.0
    K = np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1.0]])
    pts3d = np.random.RandomState(0).randn(10, 3) * 0.2 + [0, 0, 3.0]
    uv = pts3d[:, :2] / pts3d[:, 2:3] * f + [(W - 1) / 2, (H - 1) / 2]

    img = np.zeros((H, W, 3), np.float32)
    p = AugmentationParams(geometric_enabled=True, crop_jitter_fraction=0.1)
    _, K_new, uv_new = geometric_crop_jitter(img, K, rng, p, keypoints_xy=uv)

    assert abs(K_new[0, 2] - K[0, 2]) > 0 or abs(K_new[1, 2] - K[1, 2]) > 0
    uv_reproj = pts3d[:, :2] / pts3d[:, 2:3] * f + K_new[:2, 2]
    np.testing.assert_allclose(uv_reproj, uv_new, atol=1e-6)


def test_disabled_augmentation_is_identity():
    samples = _make_mv_samples(n=1)
    from smilify_tpu.data.hdf5_dataset import collate_multiview  # noqa

    sample = {
        "images": np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32),
        "view_mask": np.array([True, True]),
        "camera_intrinsics": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        "keypoints_2d": np.random.RandomState(1).rand(2, 5, 2).astype(np.float32),
    }
    out = augment_multiview_sample(sample, np.random.default_rng(0), AugmentationParams(enabled=False))
    np.testing.assert_array_equal(out["images"], sample["images"])


def test_augmented_dataset_wrapper():
    """Train-split augmentation wrapper: pixels change, labels don't;
    deterministic per (epoch, idx); fresh across epochs (reference augments
    inside the dataset when augment=True, val/test stay clean)."""
    import numpy as np

    from smilify_tpu.data.augmentation import AugmentationParams, AugmentedDataset

    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"image": rng.rand(16, 16, 3).astype(np.float32),
                    "keypoints_2d": np.full((4, 2), i, np.float32)}

    p = AugmentationParams(enabled=True, gaussian_noise_std=0.05,
                           gaussian_blur_prob=0.0, random_erasing_prob=0.0)
    aug = AugmentedDataset(DS(), p, seed=7, multiview=False)
    base = DS()[1]
    a1 = aug[1]
    assert not np.allclose(a1["image"], base["image"])          # pixels augmented
    np.testing.assert_array_equal(a1["keypoints_2d"], base["keypoints_2d"])
    np.testing.assert_allclose(aug[1]["image"], a1["image"])     # deterministic
    aug.set_epoch(1)
    a2 = aug[1]
    assert not np.allclose(a2["image"], a1["image"])             # fresh per epoch
    # disabled → identity
    off = AugmentedDataset(DS(), AugmentationParams(enabled=False), multiview=False)
    np.testing.assert_array_equal(off[2]["image"], DS()[2]["image"])
