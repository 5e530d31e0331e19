"""SLEAP toolchain tests: synthetic-camera triangulation round-trip and
camera refinement recovering perturbed extrinsics (the reference's
synthetic-ground-truth test pattern)."""

import numpy as np
import pytest

from smilify_tpu.data.sleap import (
    CameraCalibration,
    generate_reprojections,
    refine_cameras,
    reprojection_error,
    triangulate_frames,
)


def _ring_cameras(n=4, radius=2.0, f=400.0, size=(640, 480)):
    import cv2

    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        C = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.6])
        # look-at origin: z axis toward origin
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world→cam rows
        t = -R @ C
        rvec = cv2.Rodrigues(R)[0].reshape(3)
        K = np.array([[f, 0, size[0] / 2], [0, f, size[1] / 2], [0, 0, 1.0]])
        cams.append(CameraCalibration(f"cam{i}", size, K, np.zeros(5), rvec, t))
    return cams


def _project_all(cams, pts3d):
    F = 1
    V, K = len(cams), pts3d.shape[0]
    p2d = np.zeros((F, V, K, 2))
    for v, c in enumerate(cams):
        p2d[0, v] = c.project(pts3d)
    return p2d


def test_triangulation_recovers_points():
    rng = np.random.RandomState(0)
    cams = _ring_cameras()
    pts = rng.randn(10, 3) * 0.2
    p2d = _project_all(cams, pts)
    scores = np.ones(p2d.shape[:3])
    rec, valid = triangulate_frames(p2d, scores, cams)
    assert valid.all()
    np.testing.assert_allclose(rec[0], pts, atol=1e-6)


def test_triangulation_min_views_and_confidence():
    rng = np.random.RandomState(1)
    cams = _ring_cameras()
    pts = rng.randn(5, 3) * 0.2
    p2d = _project_all(cams, pts)
    scores = np.ones(p2d.shape[:3])
    scores[0, 2:, 0] = 0.0  # joint 0 confident in only 2 views
    scores[0, 1:, 1] = 0.0  # joint 1 in only 1 view → invalid
    rec, valid = triangulate_frames(p2d, scores, cams, min_views=2, min_confidence=0.3)
    assert valid[0, 0] and not valid[0, 1]
    np.testing.assert_allclose(rec[0, 0], pts[0], atol=1e-6)
    assert np.isnan(rec[0, 1]).all()


def test_camera_refinement_recovers_perturbation():
    rng = np.random.RandomState(2)
    cams = _ring_cameras()
    pts = rng.randn(40, 3) * 0.25
    p2d = _project_all(cams, pts)
    scores = np.ones(p2d.shape[:3])

    # perturb one camera's extrinsics
    bad = [CameraCalibration(c.name, c.size, c.matrix.copy(), c.distortions.copy(),
                             c.rotation.copy(), c.translation.copy()) for c in cams]
    bad[1].rotation += np.array([0.02, -0.015, 0.01])
    bad[1].translation += np.array([0.03, -0.02, 0.01])

    pts0, _ = triangulate_frames(p2d, scores, bad)
    err_before = reprojection_error(bad, pts0, p2d, scores)
    refined, err_after = refine_cameras(p2d, scores, bad, n_outer=3, verbose=False)
    assert err_after < err_before * 0.2, (err_before, err_after)
    assert err_after < 0.5  # sub-pixel after refinement


def test_reprojection_generation():
    rng = np.random.RandomState(3)
    cams = _ring_cameras(3)
    pts = rng.randn(1, 6, 3) * 0.2
    reproj = generate_reprojections(pts, cams)
    assert reproj.shape == (1, 3, 6, 2)
    np.testing.assert_allclose(reproj[0, 0], cams[0].project(pts[0]), atol=1e-9)


def test_calibration_toml_roundtrip(tmp_path):
    from smilify_tpu.data.sleap import load_calibration_toml, save_calibration_toml

    cams = _ring_cameras(2)
    path = str(tmp_path / "calibration.toml")
    save_calibration_toml(path, cams)
    loaded = load_calibration_toml(path)
    assert len(loaded) == 2
    np.testing.assert_allclose(loaded[0].matrix, cams[0].matrix, atol=1e-9)
    np.testing.assert_allclose(loaded[1].rotation, cams[1].rotation, atol=1e-9)
