"""Single-view SLEAP preprocessor: synthetic-session golden tests.

Builds a fake SLEAP session on disk (MJPG videos + analysis-HDF5 predictions
+ calibration.toml + joint_lookup.csv + reprojections.h5), runs the
``preprocess_sleap`` CLI, and checks the produced dataset through
``SingleViewHDF5Dataset`` — the reference's synthetic-ground-truth test
pattern (``tests/README.md:55-73``)."""

import os

import numpy as np
import pytest


N_FRAMES = 5
RES_IN = 64          # source video resolution
SLEAP_NODES = ["head_node", "thorax_node", "tail_node", "unmapped_extra"]


def _make_session(tmp_path, stick_spec, two_cams=True, with_reproj=False):
    import cv2
    import h5py

    from smilify_tpu.data.sleap import CameraCalibration, save_calibration_toml

    session = tmp_path / "sessionA"
    session.mkdir()

    cams = ["cam1", "cam2"] if two_cams else ["cam1"]
    rng = np.random.RandomState(0)
    kp_by_cam = {}
    for cam in cams:
        # video: moving bright square
        vw = cv2.VideoWriter(str(session / f"{cam}.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 10, (RES_IN, RES_IN))
        for i in range(N_FRAMES):
            img = np.zeros((RES_IN, RES_IN, 3), np.uint8)
            x = 8 + 6 * i
            img[20:36, x:x + 12] = 255
            vw.write(img)
        vw.release()

        # predictions: analysis-h5 export layout
        pts = np.full((1, 2, len(SLEAP_NODES), N_FRAMES), np.nan)
        scores = np.zeros((1, len(SLEAP_NODES), N_FRAMES), np.float32)
        for i in range(N_FRAMES):
            for k in range(3):  # 3 mapped nodes; leave 'unmapped_extra' NaN
                pts[0, 0, k, i] = 10 + 6 * i + 3 * k     # x
                pts[0, 1, k, i] = 24 + 2 * k             # y
                scores[0, k, i] = 0.9
        # frame 2 of cam1 gets low confidence on all nodes → invisible but
        # still annotated (finite)
        if cam == "cam1":
            scores[0, :3, 2] = 0.1
        kp_by_cam[cam] = (pts, scores)
        with h5py.File(session / f"{cam}.analysis.h5", "w") as f:
            f["tracks"] = pts
            f["point_scores"] = scores
            f["node_names"] = np.asarray([n.encode() for n in SLEAP_NODES])
            f["edge_inds"] = np.asarray([[0, 1], [1, 2]])

    cal = [
        CameraCalibration(
            name=cam, size=(RES_IN, RES_IN),
            matrix=np.array([[70.0, 0, 32], [0, 70.0, 32], [0, 0, 1]]),
            distortions=np.zeros(5),
            rotation=np.zeros(3) if i == 0 else np.array([0.0, 0.3, 0.0]),
            translation=np.array([0.0, 0.0, 2.0 + i]),
        )
        for i, cam in enumerate(cams)
    ]
    save_calibration_toml(str(session / "calibration.toml"), cal)

    if with_reproj:
        with h5py.File(session / "reprojections.h5", "w") as f:
            for cam in cams:
                pts, _ = kp_by_cam[cam]
                # shifted copies of the raw predictions → detectably different
                rp = np.transpose(pts[0], (2, 1, 0)).copy()  # (F, K, 2)
                rp[..., 0] += 2.0
                f[cam] = rp

    # lookup: sleap node → model joint names (first three model joints)
    joints = list(stick_spec.joint_names)
    lookup = session.parent / "joint_lookup.csv"
    lookup.write_text(
        "sleap_name,model_name\n"
        f"head_node,{joints[1]}\n"
        f"thorax_node,{joints[2]}\n"
        f"tail_node,{joints[3]}\n"
        "unmapped_extra,\n"
    )
    return session.parent, str(lookup)


def _run(sessions_dir, out, lookup, extra=()):
    from smilify_tpu.cli.preprocess_sleap import main
    from tests.conftest import STICK_PKL

    main([str(sessions_dir), str(out), "--model", STICK_PKL,
          "--target-resolution", "32", "--joint-lookup", lookup,
          "--validate", *extra])


def test_preprocess_sleap_session(tmp_path, stick_spec):
    from smilify_tpu.data.hdf5_dataset import SingleViewHDF5Dataset

    sessions_dir, lookup = _make_session(tmp_path, stick_spec)
    out = tmp_path / "sv.h5"
    _run(sessions_dir, out, lookup)

    ds = SingleViewHDF5Dataset(str(out))
    assert len(ds) == 2 * N_FRAMES  # 2 cameras × 5 annotated frames
    s = ds[0]
    J = stick_spec.n_joints
    assert s["keypoints_2d"].shape == (J, 2)
    assert s["image"].shape == (32, 32, 3)
    # mapped joints 1..3 visible, everything else not
    vis = s["keypoint_visibility"]
    assert vis[1] == 1 and vis[2] == 1 and vis[3] == 1
    assert vis[4:].sum() == 0 and vis[0] == 0
    # keypoint scaled into the crop: x_src=10 → 10 * 32/64
    np.testing.assert_allclose(s["keypoints_2d"][1], [10 * 0.5, 24 * 0.5], atol=1e-4)
    # GT camera params from calibration
    assert "fov" in s and "cam_rot" in s and "cam_trans" in s
    np.testing.assert_allclose(
        s["fov"][0], 2 * np.degrees(np.arctan2(32, 70.0)), atol=1e-3
    )

    # low-confidence frame marked invisible (cam1 is first: frames ordered 0..4)
    s2 = ds[2]
    assert s2["keypoint_visibility"][1:4].sum() == 0


def test_preprocess_sleap_reprojections_and_bbox(tmp_path, stick_spec):
    from smilify_tpu.data.hdf5_dataset import SingleViewHDF5Dataset

    sessions_dir, lookup = _make_session(tmp_path, stick_spec, two_cams=False,
                                         with_reproj=True)
    out_raw = tmp_path / "raw.h5"
    out_rp = tmp_path / "rp.h5"
    _run(sessions_dir, out_raw, lookup)
    _run(sessions_dir, out_rp, lookup, extra=("--use-reprojections",))

    a = SingleViewHDF5Dataset(str(out_raw))[0]["keypoints_2d"]
    b = SingleViewHDF5Dataset(str(out_rp))[0]["keypoints_2d"]
    # reprojections shifted x by +2 source px → +1 at half resolution
    np.testing.assert_allclose(b[1, 0] - a[1, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(b[1, 1], a[1, 1], atol=1e-4)

    out_bbox = tmp_path / "bbox.h5"
    _run(sessions_dir, out_bbox, lookup, extra=("--crop-mode", "bbox_crop"))
    s = SingleViewHDF5Dataset(str(out_bbox))[0]
    # bbox crop keeps all mapped keypoints in frame
    assert s["keypoint_visibility"][1:4].sum() == 3


def test_discover_sessions_flat_and_nested(tmp_path, stick_spec):
    from smilify_tpu.cli.preprocess_sleap import discover_sessions

    sessions_dir, _ = _make_session(tmp_path, stick_spec)
    assert [os.path.basename(s) for s in discover_sessions(str(sessions_dir))] == ["sessionA"]
    # the session dir itself also works (single-session mode)
    got = discover_sessions(str(sessions_dir / "sessionA"))
    assert len(got) == 1


def test_video_frame_dataset_modes(tmp_path, stick_spec):
    """Raw-video inference input: default/centred/bbox_crop crop modes
    (reference run_singleview_inference.py)."""
    from smilify_tpu.data.sleap_raw import read_joint_lookup_csv
    from smilify_tpu.data.video import VideoFrameDataset

    sessions_dir, lookup = _make_session(tmp_path, stick_spec, two_cams=False)
    video = str(sessions_dir / "sessionA" / "cam1.avi")
    preds = str(sessions_dir / "sessionA" / "cam1.analysis.h5")

    ds = VideoFrameDataset(video, resolution=32, crop_mode="default")
    assert len(ds) == N_FRAMES
    s = ds[0]
    assert s["image"].shape == (32, 32, 3) and s["image"].dtype == np.float32

    ds_bbox = VideoFrameDataset(
        video, resolution=32, crop_mode="bbox_crop", sleap_predictions=preds,
        joint_names=list(stick_spec.joint_names),
        joint_lookup=read_joint_lookup_csv(lookup),
    )
    s = ds_bbox[1]
    # mapped joints visible inside the bbox crop
    assert s["keypoint_visibility"][1:4].sum() == 3
    assert s["keypoint_visibility"].sum() == 3

    # bbox_crop without predictions is an error
    with pytest.raises(ValueError):
        VideoFrameDataset(video, crop_mode="bbox_crop")

    ds.close(); ds_bbox.close()


@pytest.mark.slow
def test_sleap_preprocess_to_training_chain(tmp_path, stick_spec):
    """The VERDICT #4 'done' criterion: a preprocess_sleap dataset feeds
    train_regressor end-to-end."""
    from smilify_tpu.cli.train_regressor import main as train

    sessions_dir, lookup = _make_session(tmp_path, stick_spec)
    out = tmp_path / "sv.h5"
    _run(sessions_dir, out, lookup)

    train(["--model", "/root/reference/3D_model_prep/SMILy_STICK.pkl",
           "--data-path", str(out), "--epochs", "1",
           "--output-dir", str(tmp_path / "run"),
           "--set", "model.backbone_name=unet_micro", "model.input_resolution=32",
           "training.batch_size=4", "dataset.dataset_fraction=1.0",
           "model.transformer_depth=1", "model.transformer_heads=2",
           "model.freeze_backbone=false", "dataset.train_ratio=0.8",
           "dataset.val_ratio=0.1", "dataset.test_ratio=0.1",
           "output.generate_visualizations_every=100"])
    assert (tmp_path / "run" / "final_model").exists()
