"""Soft-silhouette rasterizer tests: geometry sanity, differentiability, and
Pallas-kernel ↔ pure-JAX-oracle parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smilify_tpu.render.rasterizer_ref import soft_silhouette_ref, pixel_ndc_grid
from smilify_tpu.render.rasterizer import soft_silhouette
from smilify_tpu.render.cameras import default_camera

IMG = (64, 128)  # H, W (W must cover one 128-lane tile for the kernel test)


def _big_triangle(dtype=jnp.float32):
    """A triangle covering the image center, at depth 1."""
    return jnp.asarray(
        [[0.8, -0.7, 1.0], [-0.8, -0.7, 1.0], [0.0, 0.9, 1.0]],
        dtype=dtype,
    ), jnp.asarray([[0, 1, 2]], dtype=jnp.int32)


def test_ref_inside_outside():
    verts, faces = _big_triangle()
    alpha = np.asarray(soft_silhouette_ref(verts, faces, IMG))
    assert alpha.shape == IMG
    H, W = IMG
    # image center (0,0 NDC) is inside the triangle
    assert alpha[H // 2, W // 2] > 0.999
    # corners are outside
    assert alpha[0, 0] < 1e-3 and alpha[-1, -1] < 1e-3
    assert (alpha >= 0).all() and (alpha <= 1).all()


def test_ref_silhouette_aligns_with_projection():
    """A small triangle around a world point must produce a blob at the
    projected pixel — silhouette/keypoint consistency, the core invariant the
    fitter relies on."""
    cam = default_camera()
    center = jnp.asarray([0.3, -0.2, 0.0])
    offsets = jnp.asarray([[0.05, 0.0, 0.0], [-0.05, 0.05, 0.0], [-0.05, -0.05, 0.0]])
    verts_world = center + offsets
    H, W = 128, 128

    pts_view = cam.world_to_view(verts_world)
    ndc = cam.view_to_ndc(pts_view)
    verts_ndc = jnp.concatenate([ndc[:, :2], pts_view[:, 2:3]], axis=1)
    alpha = np.asarray(soft_silhouette_ref(verts_ndc, jnp.asarray([[0, 1, 2]]), (H, W)))

    yx = np.asarray(cam.project_points_yx(center[None], (H, W)))[0]
    # centroid of the alpha mass should be near the projected point
    ys, xs = np.mgrid[0:H, 0:W]
    cy = (alpha * ys).sum() / alpha.sum()
    cx = (alpha * xs).sum() / alpha.sum()
    assert abs(cy - yx[0]) < 2.0, (cy, yx)
    assert abs(cx - yx[1]) < 2.0, (cx, yx)


def test_ref_gradient_direction():
    verts, faces = _big_triangle()

    def coverage(dx):
        v = verts.at[:, 0].add(dx)
        # scale triangle down so translation changes partial coverage
        v = v.at[:, :2].multiply(0.3)
        return soft_silhouette_ref(v, faces, IMG).sum()

    g = jax.grad(coverage)(jnp.asarray(0.0))
    # moving a fully-visible triangle horizontally shouldn't change total mass much
    assert abs(float(g)) < 5.0

    def area(scale):
        v = verts.at[:, :2].multiply(scale)
        return soft_silhouette_ref(v, faces, IMG).sum()

    g2 = jax.grad(area)(jnp.asarray(0.4))
    assert float(g2) > 0  # growing the triangle increases coverage


def test_ref_znear_culling():
    verts, faces = _big_triangle()
    behind = verts.at[:, 2].set(-1.0)
    alpha = np.asarray(soft_silhouette_ref(behind, faces, IMG, znear=0.0))
    assert alpha.max() < 1e-6


def test_signed_distance_analytic_fixtures():
    """Hand-computed signed squared distances for known triangles — pins the
    distance semantics independently of any self-consistency (SURVEY §7 names
    convention drift the top correctness risk)."""
    from smilify_tpu.render.rasterizer_ref import signed_distance_to_faces

    tri = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])  # right triangle

    cases = [
        # (point, expected signed squared distance)
        ((0.25, 0.25), -(0.25 ** 2)),          # inside; nearest edge y=0 or x=0
        ((0.5, -0.3), 0.09),                    # below edge AB: d=0.3
        ((-0.4, 0.5), 0.16),                    # left of edge CA: d=0.4
        ((2.0, 0.0), 1.0),                       # beyond vertex B: d=1
        ((1.0, 1.0), 0.5),                        # outside hypotenuse: d=√2/2
        ((0.0, 0.0), 0.0),                        # exactly on vertex A
        ((0.5, 0.0), 0.0),                        # exactly on edge AB
        ((-1.0, -1.0), 2.0),                      # diagonal from vertex A
    ]
    for (px, py), want in cases:
        got = float(signed_distance_to_faces(jnp.asarray([px, py]), tri))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"point {(px, py)}")


def test_pixel_ndc_grid_convention_fixtures():
    """PyTorch3D NDC convention pinned by hand-computed values: +X left,
    +Y up, pixel centers at (2i+1)/S − 1 flipped, short side spans [-1, 1]."""
    from smilify_tpu.render.rasterizer_ref import pixel_ndc_grid

    g = np.asarray(pixel_ndc_grid((4, 4)))
    # top-left pixel center: x_ndc = -(2·0+1-4)/4 = 0.75, y_ndc = 0.75
    np.testing.assert_allclose(g[0, 0], [0.75, 0.75], atol=1e-6)
    # bottom-right: x = -(2·3+1-4)/4 = -0.75, y = -0.75
    np.testing.assert_allclose(g[3, 3], [-0.75, -0.75], atol=1e-6)
    # x decreases with column, y decreases with row (left/up positive)
    assert (np.diff(g[0, :, 0]) < 0).all()
    assert (np.diff(g[:, 0, 1]) < 0).all()

    # non-square: the SHORT side spans [-1,1]; the long side extends past ±1
    g2 = np.asarray(pixel_ndc_grid((2, 4)))  # H=2 short
    np.testing.assert_allclose(g2[0, 0, 1], 0.5, atol=1e-6)     # y from short side
    np.testing.assert_allclose(g2[0, 0, 0], 1.5, atol=1e-6)     # x extends to ±1.5


def test_alpha_analytic_single_triangle():
    """Alpha at an interior pixel must follow the exact SoftRas formula
    1 − exp(−softplus(−d/σ)) for the hand-computed d of that pixel."""
    from smilify_tpu.render.rasterizer_ref import SIGMA

    verts = jnp.asarray([[0.9, 0.9, 1.0], [-0.9, 0.9, 1.0], [0.0, -0.9, 1.0]])
    faces = jnp.asarray([[0, 1, 2]])
    H = W = 8
    alpha = np.asarray(soft_silhouette_ref(verts, faces, (H, W)))
    # pixel (0, 3): NDC x = -(2·3+1-8)/8 = 0.125, y = 0.875 — INSIDE (just
    # below the top edge y=0.9) → d = −0.025² (signed squared distance)
    d = -(0.025 ** 2)
    want = 1.0 - np.exp(-np.log1p(np.exp(-d / SIGMA)))
    np.testing.assert_allclose(alpha[0, 3], want, atol=1e-5)


@pytest.mark.slow
def test_pallas_matches_ref_forward():
    rng = np.random.RandomState(0)
    V, F = 30, 40
    verts = jnp.asarray(
        np.concatenate([rng.uniform(-0.9, 0.9, (V, 2)), np.ones((V, 1))], axis=1), dtype=jnp.float32
    )
    faces = jnp.asarray(rng.randint(0, V, (F, 3)), dtype=jnp.int32)

    a_ref = soft_silhouette(verts, faces, IMG, use_pallas=False)
    a_pal = soft_silhouette(verts, faces, IMG, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=1e-4)


@pytest.mark.slow
def test_pallas_matches_ref_gradient():
    rng = np.random.RandomState(1)
    V, F = 12, 10
    verts = jnp.asarray(
        np.concatenate([rng.uniform(-0.8, 0.8, (V, 2)), np.ones((V, 1))], axis=1), dtype=jnp.float32
    )
    faces = jnp.asarray(rng.randint(0, V, (F, 3)), dtype=jnp.int32)
    target = jnp.zeros(IMG)

    def loss(v, use_pallas, interpret=False):
        a = soft_silhouette(v, faces, IMG, use_pallas=use_pallas, interpret=interpret)
        return jnp.sum((a - target) ** 2)

    g_ref = np.asarray(jax.grad(lambda v: loss(v, False))(verts))
    g_pal = np.asarray(jax.grad(lambda v: loss(v, True, True))(verts))
    # z gradients: the pallas path doesn't differentiate the znear cull mask
    # (piecewise-constant) — compare xy only
    np.testing.assert_allclose(g_pal[:, :2], g_ref[:, :2], atol=5e-3, rtol=1e-3)


@pytest.mark.smoke
def test_silhouette_iou_parity_pallas_vs_oracle(stick_spec):
    """The BASELINE parity metric: IoU between the Pallas silhouette and the
    oracle on the real model must be ~1."""
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.utils.visualization import silhouette_iou

    spec = stick_spec
    out = smil_forward(spec, jnp.zeros((1, spec.n_betas)), jnp.zeros((1, spec.n_joints, 3)))
    cam = default_camera()
    pv = cam.world_to_view(out.verts[0])
    ndc = cam.view_to_ndc(pv)
    verts_ndc = jnp.concatenate([ndc[:, :2], pv[:, 2:3]], axis=1)

    a_ref = soft_silhouette(verts_ndc, spec.faces, (128, 128), znear=1e-3, use_pallas=False)
    a_pal = soft_silhouette(verts_ndc, spec.faces, (128, 128), znear=1e-3, use_pallas=True,
                            interpret=jax.default_backend() != "tpu")
    iou = silhouette_iou(a_pal, a_ref)
    assert iou > 0.999, iou
    coverage = float(jnp.mean((a_ref > 0.5)))
    assert 0.005 < coverage < 0.9  # real object rendered


def test_worklist_matches_exact_uncapped():
    """Work-list raster (approx_max_faces high enough to never truncate) is
    numerically identical to the exact kernel — same subgroups, same math."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    V, F = 60, 40
    verts = np.concatenate([rng.randn(V, 2) * 0.5, rng.rand(V, 1) * 2 + 1], axis=1)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    vn = jnp.asarray(verts.astype(np.float32))
    interp = jax.default_backend() != "tpu"

    a_ref = soft_silhouette(vn, faces, (64, 64), use_pallas=False)
    a_wl = soft_silhouette(vn, faces, (64, 64), use_pallas=True, interpret=interp,
                           approx_max_faces=4096)
    np.testing.assert_allclose(np.asarray(a_wl), np.asarray(a_ref), atol=2e-6)

    def loss(v, **kw):
        return jnp.sum(soft_silhouette(v, faces, (64, 64), **kw) ** 2)

    g_ref = np.asarray(jax.grad(lambda v: loss(v, use_pallas=False))(vn))
    g_wl = np.asarray(jax.grad(lambda v: loss(
        v, use_pallas=True, interpret=interp, approx_max_faces=4096))(vn))
    np.testing.assert_allclose(g_wl[:, :2], g_ref[:, :2], atol=5e-3, rtol=1e-3)


def test_approx_mode_dispatch():
    """approx_max_faces must never silently fall back to the exact raster:
    with use_pallas=False it raises, and with the auto-select on a non-TPU
    backend it routes to the work-list kernel in interpret mode (matching the
    exact result at an uncapped budget) instead of ignoring the cap."""
    import jax
    import jax.numpy as jnp
    import pytest

    rng = np.random.RandomState(5)
    V, F = 30, 16
    verts = np.concatenate([rng.randn(V, 2) * 0.5, rng.rand(V, 1) + 1], axis=1)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    vn = jnp.asarray(verts.astype(np.float32))

    with pytest.raises(ValueError, match="work-list"):
        soft_silhouette(vn, faces, (32, 32), use_pallas=False, approx_max_faces=100)

    # auto-select (use_pallas=None) honors the cap on every backend
    a = soft_silhouette(vn, faces, (32, 32), approx_max_faces=1024)
    a_ref = soft_silhouette(vn, faces, (32, 32), use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), atol=2e-6)


def test_worklist_cap_iou_delta(stick_spec):
    """The opt-in z-nearest per-tile cap: IoU vs the exact silhouette on the
    real model stays ~1 at the production cap (the reference itself
    approximates with 100 z-nearest faces per pixel, p3d_renderer.py:47).

    The safe cap scales with resolution — a 32x32 tile covers 1/16 of a 128
    image but 1/256 of a 512 one, so per-tile face counts are far higher at
    low resolution (measured head-on stick: max 321 subgroups/tile at 128 vs
    156 at 512). On TPU this runs the production config (512, cap 800,
    measured IoU 0.992); on CPU interpret mode (where 512 is too slow) it
    runs 128 with the resolution-scaled cap."""
    import jax
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.utils.visualization import silhouette_iou

    spec = stick_spec
    out = smil_forward(spec, jnp.zeros((1, spec.n_betas)), jnp.zeros((1, spec.n_joints, 3)))
    cam = default_camera()
    pv = cam.world_to_view(out.verts[0])
    ndc = cam.view_to_ndc(pv)
    verts_ndc = jnp.concatenate([ndc[:, :2], pv[:, 2:3]], axis=1)
    on_tpu = jax.default_backend() == "tpu"
    size, cap, bound = ((512, 800, 0.99) if on_tpu else (128, 2600, 0.999))

    a_exact = soft_silhouette(verts_ndc, spec.faces, (size, size), znear=1e-3,
                              use_pallas=True, interpret=not on_tpu)
    a_cap = soft_silhouette(verts_ndc, spec.faces, (size, size), znear=1e-3,
                            use_pallas=True, interpret=not on_tpu, approx_max_faces=cap)
    assert silhouette_iou(a_cap, a_exact) > bound


def test_auto_cap_policy():
    """The CLI-default cap: IoU-gated resolution scaling on TPU, exact (None)
    off-TPU and for tiny images; --exact and integer overrides win."""
    import argparse

    import jax

    from smilify_tpu.cli.optimize_to_joints import resolve_approx_max_faces
    from smilify_tpu.render.rasterizer import auto_approx_max_faces

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        assert auto_approx_max_faces((512, 512)) == 800
        assert auto_approx_max_faces((256, 256)) == 1600
        assert auto_approx_max_faces((128, 128)) == 3200
        assert auto_approx_max_faces((64, 64)) is None
    else:
        assert auto_approx_max_faces((512, 512)) is None

    ns = argparse.Namespace(exact=False, approx_max_faces="auto")
    assert resolve_approx_max_faces(ns, (512, 512), auto_approx_max_faces) == \
        (800 if on_tpu else None)
    ns = argparse.Namespace(exact=True, approx_max_faces="auto")
    assert resolve_approx_max_faces(ns, (512, 512), auto_approx_max_faces) is None
    ns = argparse.Namespace(exact=False, approx_max_faces="700")
    assert resolve_approx_max_faces(ns, (512, 512), auto_approx_max_faces) == 700
    ns = argparse.Namespace(exact=False, approx_max_faces="exact")
    assert resolve_approx_max_faces(ns, (512, 512), auto_approx_max_faces) is None
