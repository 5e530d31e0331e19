"""CLI tests for ``smilify_tpu.cli.sleap_tools`` — the toolchain entry points
(reference standalone scripts: triangulate_3d_points.py,
refine_camera_params.py, generate_reprojections.py, merge/filter/match_scale
multiview dataset tools). Library-level behavior is covered by
test_sleap_toolchain.py / test_dataset_tools.py; these tests pin the
on-disk contracts: session layout in, h5/toml artifacts out."""

import os

import numpy as np
import pytest

from tests.test_dataset_tools import _write
from tests.test_sleap_toolchain import _ring_cameras

F_FRAMES = 3
K_JOINTS = 6


def _make_session(tmp_path, cams, rng):
    """Session dir with per-camera analysis-h5 predictions of known 3D points."""
    import h5py

    from smilify_tpu.data.sleap import save_calibration_toml

    session = tmp_path / "sess"
    session.mkdir()
    gt3d = rng.randn(F_FRAMES, K_JOINTS, 3) * 0.2
    nodes = [f"node{k}" for k in range(K_JOINTS)]
    for cam in cams:
        pts = np.full((1, 2, K_JOINTS, F_FRAMES), np.nan)
        scores = np.zeros((1, K_JOINTS, F_FRAMES), np.float32)
        for f in range(F_FRAMES):
            uv = cam.project(gt3d[f])
            pts[0, 0, :, f] = uv[:, 0]
            pts[0, 1, :, f] = uv[:, 1]
            scores[0, :, f] = 0.95
        with h5py.File(session / f"{cam.name}.analysis.h5", "w") as h:
            h["tracks"] = pts
            h["point_scores"] = scores
            h["node_names"] = np.asarray([n.encode() for n in nodes])
            h["edge_inds"] = np.asarray([[k, k + 1] for k in range(K_JOINTS - 1)])
    save_calibration_toml(str(session / "calibration.toml"), cams)
    return session, gt3d


def test_triangulate_and_reproject_cli(tmp_path):
    import h5py

    from smilify_tpu.cli.sleap_tools import main
    from smilify_tpu.data.sleap import read_points3d_h5

    rng = np.random.RandomState(0)
    cams = _ring_cameras(n=4)
    session, gt3d = _make_session(tmp_path, cams, rng)

    main(["triangulate", "--session", str(session)])
    p3d_path = session / "points3d.h5"
    assert p3d_path.exists()
    rec = read_points3d_h5(str(p3d_path))
    np.testing.assert_allclose(rec, gt3d, atol=1e-5)

    reproj_path = tmp_path / "reprojections.h5"
    main(["reproject", "--points3d", str(p3d_path),
          "--calibration", str(session / "calibration.toml"),
          "--output", str(reproj_path)])
    with h5py.File(reproj_path, "r") as f:
        assert set(f.keys()) == {c.name for c in cams}
        for v, cam in enumerate(cams):
            got = f[cam.name][:]
            assert got.shape == (F_FRAMES, K_JOINTS, 2)
            for fr in range(F_FRAMES):
                np.testing.assert_allclose(got[fr], cam.project(gt3d[fr]), atol=1e-4)


def test_refine_cameras_cli(tmp_path, capsys):
    from smilify_tpu.cli.sleap_tools import main
    from smilify_tpu.data.sleap import load_calibration_toml, save_calibration_toml

    rng = np.random.RandomState(1)
    cams = _ring_cameras(n=4)
    session, _ = _make_session(tmp_path, cams, rng)

    # perturb one camera's extrinsics in the saved calibration
    bad = load_calibration_toml(str(session / "calibration.toml"))
    bad[1].rotation += np.array([0.02, -0.015, 0.01])
    bad[1].translation += np.array([0.03, -0.02, 0.01])
    save_calibration_toml(str(session / "calibration.toml"), bad)

    out_toml = tmp_path / "refined.toml"
    main(["refine-cameras", "--session", str(session),
          "--output", str(out_toml), "--iters", "2"])
    txt = capsys.readouterr().out
    assert out_toml.exists()
    line = [ln for ln in txt.splitlines() if "mean reprojection error" in ln][-1]
    before, after = line.split("error")[1].split("px")[0].split("→")
    assert float(after) < float(before) * 0.1, line  # refinement recovers


def test_merge_filter_match_scale_cli(tmp_path, capsys):
    import h5py

    from smilify_tpu.cli.sleap_tools import main
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    a = _write(tmp_path, "a.h5", n=3, v=2)
    b = _write(tmp_path, "b.h5", n=2, v=3)
    merged = str(tmp_path / "merged.h5")
    main(["merge", a, b, "--output", merged, "--scale-factors", "1.0,2.0"])
    assert len(MultiViewHDF5Dataset(merged)) == 5

    # scale factor must have multiplied b's camera translations
    with h5py.File(b, "r") as fb, h5py.File(merged, "r") as fm:
        tb = fb["multiview_keypoints/camera_extrinsics_t"][0, 0]
        tm = fm["multiview_keypoints/camera_extrinsics_t"][3, 0]
        np.testing.assert_allclose(tm, tb * 2.0, rtol=1e-6)

    filtered = str(tmp_path / "filtered.h5")
    main(["filter", merged, "--output", filtered, "--min-visible-keypoints", "1",
          "--min-views", "1"])
    assert os.path.exists(filtered)

    main(["match-scale", a, "--reference-dataset", b, "--estimate-only"])
    est = [ln for ln in capsys.readouterr().out.splitlines()
           if "estimated world-scale ratio" in ln][-1]
    scale = float(est.rsplit(":", 1)[1])
    scaled = str(tmp_path / "scaled.h5")
    main(["match-scale", a, "--output", scaled, "--scale", str(scale)])
    with h5py.File(a, "r") as fa, h5py.File(scaled, "r") as fs:
        np.testing.assert_allclose(
            fs["multiview_keypoints/camera_extrinsics_t"][:],
            fa["multiview_keypoints/camera_extrinsics_t"][:] * scale, rtol=1e-5)


def test_merge_scale_factor_count_mismatch(tmp_path):
    from smilify_tpu.cli.sleap_tools import main

    a = _write(tmp_path, "a.h5")
    with pytest.raises(SystemExit, match="2 entries for 1 inputs"):
        main(["merge", a, "--output", str(tmp_path / "m.h5"),
              "--scale-factors", "1.0,2.0"])
