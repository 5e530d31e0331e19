"""Multi-view preprocessing tests: crop-mode intrinsics consistency and a full
synthetic SLEAP-session → HDF5 round trip through the CLI."""

import os

import numpy as np
import pytest

from smilify_tpu.data.preprocess_multiview import crop_and_resize, filter_outlier_3d


def _proj(K, pts3d):
    uv = pts3d[:, :2] / pts3d[:, 2:3]
    return uv * np.diag(K)[:2] + K[:2, 2]


@pytest.mark.parametrize("mode", ["default", "centred", "bbox_crop"])
def test_crop_intrinsics_consistency(mode):
    """After cropping, projecting the same 3D points through K_new must land on
    the transformed keypoints — the invariant every crop mode must keep."""
    rng = np.random.RandomState(0)
    H, W = 96, 128
    f = 150.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    pts3d = rng.randn(12, 3) * 0.1 + [0, 0, 2.0]
    uv = _proj(K, pts3d)

    img = rng.rand(H, W, 3).astype(np.float32)
    res = crop_and_resize(img, uv, K, target_resolution=64, mode=mode)
    uv_new = _proj(res.K_new, pts3d)
    np.testing.assert_allclose(uv_new, res.keypoints, atol=1e-6)
    assert res.image.shape[:2] == (64, 64)


def test_outlier_3d_filter():
    pts = np.random.RandomState(0).randn(10, 3).astype(np.float32) * 0.1
    pts[3] = [50.0, 0, 0]  # absurd outlier
    pts[7] = 0.0  # sentinel stays
    out = filter_outlier_3d(pts)
    assert np.all(out[3] == 0)
    assert np.all(out[7] == 0)
    np.testing.assert_array_equal(out[0], pts[0])


@pytest.mark.slow
def test_sleap_multiview_cli_end_to_end(tmp_path):
    """Synthesize a 3-camera SLEAP session (videos + analysis h5 + anipose
    calibration) and run the preprocessor CLI → readable multi-view HDF5."""
    import subprocess
    import sys

    import cv2
    import h5py

    from smilify_tpu.data.sleap import CameraCalibration, save_calibration_toml
    from tests.test_sleap_toolchain import _ring_cameras

    cams = _ring_cameras(3, size=(96, 96), f=120.0)
    sess = tmp_path / "session1"
    os.makedirs(sess)
    rng = np.random.RandomState(0)
    F, K = 4, 6
    pts3d = rng.randn(F, K, 3) * 0.15

    for cam in cams:
        # analysis h5: tracks (n_tracks, 2, n_nodes, n_frames)
        pts2d = np.stack([cam.project(pts3d[f]) for f in range(F)])  # (F, K, 2)
        tracks = np.transpose(pts2d, (2, 1, 0))[None]  # (1, 2, K, F)
        with h5py.File(sess / f"{cam.name}.h5", "w") as hf:
            hf.create_dataset("tracks", data=tracks)
            hf.create_dataset("node_names", data=[f"j{i}".encode() for i in range(K)])
            hf.create_dataset("point_scores", data=np.ones((1, K, F)))
        # tiny video
        vw = cv2.VideoWriter(str(sess / f"{cam.name}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                             10, (96, 96))
        for f in range(F):
            vw.write(np.full((96, 96, 3), 30 * f + 40, np.uint8))
        vw.release()

    calib = tmp_path / "calibration.toml"
    save_calibration_toml(str(calib), cams)

    out_h5 = tmp_path / "mv.h5"
    res = subprocess.run(
        [sys.executable, "-u", "-m", "smilify_tpu.cli.preprocess_sleap_multiview",
         "--sessions", str(sess), "--calibration", str(calib),
         "--output", str(out_h5), "--resolution", "64", "--crop-mode", "bbox_crop"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, (res.stdout[-1000:], res.stderr[-2000:])

    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    ds = MultiViewHDF5Dataset(str(out_h5))
    assert len(ds) == F
    s = ds[0]
    assert s["view_mask"].sum() == 3
    assert s["images"].shape[1:] == (64, 64, 3)
    # crop-adjusted intrinsics must reproject stored 2D within tolerance:
    # project the ORIGINAL 3D points through stored K', R, t
    pc = pts3d[0] @ s["camera_extrinsics_R"][0].T + s["camera_extrinsics_t"][0]
    uv = pc[:, :2] / pc[:, 2:3] * np.diag(s["camera_intrinsics"][0])[:2] + s["camera_intrinsics"][0][:2, 2]
    vis = s["keypoint_visibility"][0] > 0
    np.testing.assert_allclose(uv[vis], s["keypoints_2d"][0][vis], atol=0.5)


@pytest.mark.slow
def test_sleap_multiview_cli_joint_lookup_and_sync(tmp_path, stick_spec):
    """Joint-lookup mapping into model order + frame sync on the union of
    annotated frames with per-view dropout (reference :235, :859)."""
    import subprocess
    import sys

    import cv2
    import h5py

    from smilify_tpu.data.sleap import save_calibration_toml
    from tests.test_sleap_toolchain import _ring_cameras
    from tests.conftest import STICK_PKL

    cams = _ring_cameras(3, size=(96, 96), f=120.0)
    sess = tmp_path / "session1"
    os.makedirs(sess)
    rng = np.random.RandomState(1)
    F, K = 5, 3
    nodes = ["na", "nb", "nc"]
    pts3d = rng.randn(F, K, 3) * 0.15

    for ci, cam in enumerate(cams):
        pts2d = np.stack([cam.project(pts3d[f]) for f in range(F)])
        tracks = np.transpose(pts2d, (2, 1, 0))[None].astype(np.float64)
        scores = np.ones((1, K, F))
        if ci == 2:
            tracks[0, :, :, 3:] = np.nan  # cam3 has no data on frames 3,4
        with h5py.File(sess / f"{cam.name}.h5", "w") as hf:
            hf.create_dataset("tracks", data=tracks)
            hf.create_dataset("node_names", data=[n.encode() for n in nodes])
            hf.create_dataset("point_scores", data=scores)
        vw = cv2.VideoWriter(str(sess / f"{cam.name}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 96))
        for f in range(F):
            vw.write(np.full((96, 96, 3), 30 * f + 40, np.uint8))
        vw.release()

    # per-session calibration discovery (no --calibration flag)
    save_calibration_toml(str(sess / "calibration.toml"), cams)
    joints = list(stick_spec.joint_names)
    lookup = tmp_path / "lookup.csv"
    lookup.write_text(f"sleap,model\nna,{joints[2]}\nnb,{joints[4]}\nnc,{joints[6]}\n")

    out_h5 = tmp_path / "mv.h5"
    res = subprocess.run(
        [sys.executable, "-u", "-m", "smilify_tpu.cli.preprocess_sleap_multiview",
         "--sessions", str(sess), "--output", str(out_h5), "--resolution", "64",
         "--model", STICK_PKL, "--joint-lookup", str(lookup)],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, (res.stdout[-1000:], res.stderr[-2000:])

    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    ds = MultiViewHDF5Dataset(str(out_h5))
    assert len(ds) == F
    s0, s4 = ds[0], ds[4]
    # keypoints live in model-joint slots: only joints 2/4/6 visible
    J = stick_spec.n_joints
    assert s0["keypoints_2d"].shape[1:] == (J, 2)
    vis = s0["keypoint_visibility"][0]
    assert vis[[2, 4, 6]].sum() == 3 and vis.sum() == 3
    # frames 3,4: cam3 dropped via view_mask, others intact
    assert s0["view_mask"].sum() == 3
    assert s4["view_mask"].sum() == 2
