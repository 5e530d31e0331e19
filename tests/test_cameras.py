"""Camera convention and triangulation round-trip tests (the reference's
synthetic ground-truth pattern from tests/test_triangulation_consistency.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests._cpu_pin import cpu_pinned

pytestmark = cpu_pinned()  # dispatch-bound: CPU-subprocess on TPU runs

from smilify_tpu.render.cameras import (
    FoVCamera,
    camera_from_opencv,
    default_camera,
    triangulate_dlt,
)
from smilify_tpu.core.rotations import axis_angle_to_matrix


def _random_cameras(n, rng):
    cams = []
    for _ in range(n):
        aa = rng.randn(3) * 0.4
        R_obj = np.asarray(axis_angle_to_matrix(jnp.asarray(aa, dtype=jnp.float32)))
        cam = FoVCamera(
            R=jnp.asarray(R_obj @ np.diag([-1.0, 1.0, -1.0]), dtype=jnp.float32),
            T=jnp.asarray([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 3.0 + rng.rand()], dtype=jnp.float32),
            fov=jnp.asarray(50.0 + rng.rand() * 20, dtype=jnp.float32),
            aspect_ratio=jnp.asarray(1.0, dtype=jnp.float32),
        )
        cams.append(cam)
    return cams


def test_optical_axis_projects_to_center():
    cam = default_camera()
    # the default camera sits at (0,0,2.7) looking at the origin
    scr = cam.transform_points_screen(jnp.zeros((1, 3)), (512, 512))
    np.testing.assert_allclose(np.asarray(scr[0, :2]), [255.5, 255.5], atol=1e-4)


def test_frustum_edges_map_to_image_edges():
    cam = default_camera(fov=60.0)
    # at distance d in front of the camera, the frustum half-height is d*tan(30°)
    d = 2.7
    h = d * np.tan(np.deg2rad(30.0))
    # view +Y (up) maps to NDC +1 → screen y = (H-1)/2 - (H/2)·1 = -0.5
    world_up = jnp.asarray([[0.0, h, 0.0]])
    scr = cam.transform_points_screen(world_up, (512, 512))
    np.testing.assert_allclose(float(scr[0, 1]), -0.5, atol=1e-3)
    # world +X with R=diag(-1,1,-1) → view −X (right) → NDC −1 → screen x = W−0.5
    world_x = jnp.asarray([[h, 0.0, 0.0]])
    scr = cam.transform_points_screen(world_x, (512, 512))
    np.testing.assert_allclose(float(scr[0, 0]), 511.5, atol=1e-3)


def test_project_points_yx_swap():
    cam = default_camera()
    pts = jnp.asarray([[0.3, -0.2, 0.1]])
    scr = cam.transform_points_screen(pts, (256, 256))
    yx = cam.project_points_yx(pts, (256, 256))
    np.testing.assert_allclose(np.asarray(yx[0]), np.asarray(scr[0, [1, 0]]))


def test_camera_center():
    cam = default_camera()
    np.testing.assert_allclose(np.asarray(cam.camera_center()), [0.0, 0.0, 2.7], atol=1e-5)


def test_full_projection_matrix_matches_transform():
    rng = np.random.RandomState(0)
    cam = _random_cameras(1, rng)[0]
    pts = jnp.asarray(rng.randn(10, 3).astype(np.float32) * 0.3)
    ndc_ref = cam.transform_points_ndc(pts)
    P = cam.full_projection_matrix()
    hom = jnp.concatenate([pts, jnp.ones((10, 1))], axis=1)
    clip = jnp.matmul(hom, P.T, precision=jax.lax.Precision.HIGHEST)
    ndc_mat = clip[:, :2] / clip[:, 3:4]
    np.testing.assert_allclose(np.asarray(ndc_mat), np.asarray(ndc_ref[:, :2]), atol=1e-5)


def test_dlt_triangulation_roundtrip():
    rng = np.random.RandomState(1)
    cams = _random_cameras(4, rng)
    pts3d = jnp.asarray(rng.randn(12, 3).astype(np.float32) * 0.3)

    ndc = jnp.stack([c.transform_points_ndc(pts3d)[:, :2] for c in cams])  # (V, K, 2)
    P = jnp.stack([c.full_projection_matrix() for c in cams])
    mask = jnp.ones((4,), dtype=bool)

    rec = triangulate_dlt(ndc, P, mask, damping=1e-8)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts3d), atol=2e-3)


def test_dlt_two_views_sufficient_and_masking():
    rng = np.random.RandomState(2)
    cams = _random_cameras(4, rng)
    pts3d = jnp.asarray(rng.randn(6, 3).astype(np.float32) * 0.3)
    ndc = jnp.stack([c.transform_points_ndc(pts3d)[:, :2] for c in cams])
    # corrupt views 2,3 and mask them out
    ndc = ndc.at[2:].add(10.0)
    P = jnp.stack([c.full_projection_matrix() for c in cams])
    mask = jnp.asarray([True, True, False, False])
    rec = triangulate_dlt(ndc, P, mask, damping=1e-8)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts3d), atol=5e-3)


def test_dlt_differentiable():
    rng = np.random.RandomState(3)
    cams = _random_cameras(3, rng)
    pts3d = jnp.asarray(rng.randn(5, 3).astype(np.float32) * 0.3)
    target = pts3d + 0.01

    def loss(t_offsets):
        pms = []
        for i, c in enumerate(cams):
            c2 = c.replace(T=c.T + t_offsets[i])
            pms.append(c2.full_projection_matrix())
        ndc = jnp.stack([c.transform_points_ndc(pts3d)[:, :2] for c in cams])
        rec = triangulate_dlt(ndc, jnp.stack(pms), jnp.ones(3, dtype=bool))
        return jnp.sum((rec - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((3, 3)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_opencv_conversion_roundtrip():
    """An OpenCV camera and its converted FoVCamera must project to the same pixels."""
    rng = np.random.RandomState(4)
    H = W = 480
    f = 600.0
    K_cv = np.array([[f, 0, (W - 1) / 2.0], [0, f, (H - 1) / 2.0], [0, 0, 1.0]], dtype=np.float32)
    aa = rng.randn(3) * 0.2
    R_cv = np.asarray(axis_angle_to_matrix(jnp.asarray(aa, dtype=jnp.float32)))
    t_cv = np.array([0.05, -0.02, 2.0], dtype=np.float32)

    pts = rng.randn(20, 3).astype(np.float32) * 0.2

    # OpenCV projection
    pc = (R_cv @ pts.T).T + t_cv
    uv_cv = pc[:, :2] / pc[:, 2:3] * f + np.array([(W - 1) / 2.0, (H - 1) / 2.0])

    cam = camera_from_opencv(jnp.asarray(R_cv), jnp.asarray(t_cv), jnp.asarray(K_cv), (H, W))
    scr = np.asarray(cam.transform_points_screen(jnp.asarray(pts), (H, W)))
    np.testing.assert_allclose(scr[:, 0], uv_cv[:, 0], atol=0.05)
    np.testing.assert_allclose(scr[:, 1], uv_cv[:, 1], atol=0.05)


def test_camera_from_opencv_np_parity():
    """The numpy twin used by host-side dataset code must match the jnp
    conversion exactly (same Rz180 convention, fov-from-fy, aspect)."""
    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.data.canonical_frame import camera_from_opencv_np
    from smilify_tpu.render.cameras import camera_from_opencv

    rng = np.random.RandomState(3)
    for _ in range(3):
        import cv2

        R = cv2.Rodrigues(rng.randn(3, 1) * 0.5)[0]
        t = rng.randn(3)
        K = np.array([[200.0 + rng.rand() * 50, 0, 64], [0, 180.0 + rng.rand() * 50, 60],
                      [0, 0, 1.0]])
        size = (120, 128)
        cam = camera_from_opencv(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
                                 jnp.asarray(K, jnp.float32), size)
        Rr, T, fov, aspect = camera_from_opencv_np(R, t, K, size)
        np.testing.assert_allclose(np.asarray(cam.R), Rr, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.T), T, atol=1e-5)
        np.testing.assert_allclose(float(cam.fov), fov, atol=1e-4)
        np.testing.assert_allclose(float(cam.aspect_ratio), aspect, atol=1e-5)
