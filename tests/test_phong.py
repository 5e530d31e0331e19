"""Unit tests for the hard z-buffer rasterizer + Phong shader
(``smilify_tpu/render/phong.py``), the visualization analogue of the
reference's HardPhongShader path (``smal_fitter/p3d_renderer.py:54-70``).

These pin the streaming top-1 face selection (barycentrics kept as three
separate (H, W, C) planes — the TPU-tiling-safe layout) against analytic
expectations: coverage of a known triangle, barycentric reconstruction of
the pixel position, and z-ordering of overlapping faces.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from smilify_tpu.render.phong import rasterize_hard, render_phong  # noqa: E402
from smilify_tpu.render.rasterizer_ref import pixel_ndc_grid  # noqa: E402

RES = (16, 16)


def _full_quad(z):
    """Two triangles covering all of NDC [-2, 2]^2 at constant view-z."""
    verts = np.array(
        [[-2.0, -2.0, z], [2.0, -2.0, z], [2.0, 2.0, z], [-2.0, 2.0, z]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_full_coverage_and_zbuf():
    verts, faces = _full_quad(z=2.0)
    fid, bary, zbuf = rasterize_hard(jnp.asarray(verts), jnp.asarray(faces), RES)
    fid, bary, zbuf = np.asarray(fid), np.asarray(bary), np.asarray(zbuf)
    assert (fid >= 0).all(), "quad spans all pixel centers"
    assert np.allclose(zbuf, 2.0, atol=1e-5), "flat quad → constant z"
    # barycentrics of the winning face are a convex combination
    assert (bary >= -1e-5).all()
    assert np.allclose(bary.sum(-1), 1.0, atol=1e-5)


def test_barycentric_position_reconstruction():
    """bary @ tri_xy must reproduce the pixel-center NDC position."""
    verts, faces = _full_quad(z=1.5)
    fid, bary, _ = rasterize_hard(jnp.asarray(verts), jnp.asarray(faces), RES)
    fid, bary = np.asarray(fid), np.asarray(bary)
    tri_xy = verts[faces[fid]][..., :2]  # (H, W, 3, 2)
    recon = np.einsum("hwv,hwvc->hwc", bary, tri_xy)
    pix = np.asarray(pixel_ndc_grid(RES))
    assert np.allclose(recon, pix, atol=1e-4)


def test_nearest_face_wins():
    """A small near triangle must occlude the far full-screen quad."""
    far_v, far_f = _full_quad(z=5.0)
    near_v = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.6, 2.0]], np.float32
    )
    verts = np.concatenate([far_v, near_v])
    faces = np.concatenate([far_f, np.array([[4, 5, 6]], np.int32) ])
    fid, _, zbuf = rasterize_hard(jnp.asarray(verts), jnp.asarray(faces), RES)
    fid, zbuf = np.asarray(fid), np.asarray(zbuf)
    center = fid[RES[0] // 2, RES[1] // 2]
    assert center == 2, "near triangle owns the center pixel"
    assert np.isclose(zbuf[RES[0] // 2, RES[1] // 2], 2.0, atol=1e-5)
    # corners see only the far quad
    assert fid[0, 0] in (0, 1) and np.isclose(zbuf[0, 0], 5.0, atol=1e-5)
    # chunk streaming: same result when the near face lands in its own chunk
    fid2, _, _ = rasterize_hard(
        jnp.asarray(verts), jnp.asarray(faces), RES, face_chunk=2
    )
    assert (np.asarray(fid2) == fid).all()


def test_behind_camera_faces_ignored():
    verts, faces = _full_quad(z=-1.0)  # behind znear
    fid, _, zbuf = rasterize_hard(jnp.asarray(verts), jnp.asarray(faces), RES)
    assert (np.asarray(fid) == -1).all()
    assert np.isinf(np.asarray(zbuf)).all()


def test_render_phong_foreground_background():
    verts, faces = _full_quad(z=2.0)
    near_v = np.array(
        [[-0.3, -0.3, 1.0], [0.3, -0.3, 1.0], [0.0, 0.4, 1.0]], np.float32
    )
    vw = np.concatenate([verts, near_v])
    fc = np.concatenate([faces, np.array([[4, 5, 6]], np.int32)])
    img = np.asarray(
        render_phong(jnp.asarray(vw), jnp.asarray(vw), jnp.asarray(vw),
                     jnp.asarray(fc), RES)
    )
    assert img.shape == (*RES, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.std() > 0, "shading varies across the lit mesh"
    # background test: a mesh covering only the center leaves corners white
    img2 = np.asarray(
        render_phong(jnp.asarray(near_v), jnp.asarray(near_v),
                     jnp.asarray(near_v), jnp.asarray(np.array([[0, 1, 2]], np.int32)),
                     RES, background=(1.0, 1.0, 1.0))
    )
    assert np.allclose(img2[0, 0], 1.0) and np.allclose(img2[-1, -1], 1.0)
    assert not np.allclose(img2[RES[0] // 2, RES[1] // 2], 1.0)
