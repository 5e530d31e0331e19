"""Mesh-op tests: KNN vs brute force, chamfer, regularizer sanity, sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from tests._cpu_pin import cpu_pinned

pytestmark = cpu_pinned()  # dispatch-bound: CPU-subprocess on TPU runs

from smilify_tpu.ops.knn import knn_points
from smilify_tpu.ops.mesh_ops import (
    chamfer_distance,
    edges_from_faces,
    face_adjacency_from_faces,
    laplacian_neighbors_from_faces,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
    sample_points_from_meshes,
)


def _cube():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
        dtype=np.float32,
    )
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        dtype=np.int32,
    )
    return verts, faces


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    x = rng.randn(70, 3).astype(np.float32)
    y = rng.randn(50, 3).astype(np.float32)
    res = knn_points(jnp.asarray(x), jnp.asarray(y), K=3, tile=32)
    d_full = ((x[:, None] - y[None]) ** 2).sum(-1)
    idx_true = np.argsort(d_full, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(res.idx), idx_true)
    np.testing.assert_allclose(np.asarray(res.dists), np.take_along_axis(d_full, idx_true, 1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.knn), y[idx_true], atol=1e-6)


def test_knn_tiled_path_matches_oneshot():
    """Force the tiled (lax.map) path with a tiny oneshot budget; results and
    gradients must match the one-shot path exactly (incl. the ragged tail)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(70, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    one = knn_points(x, y, K=3)
    tiled = knn_points(x, y, K=3, tile=32, oneshot_elems=1)
    np.testing.assert_array_equal(np.asarray(one.idx), np.asarray(tiled.idx))
    np.testing.assert_allclose(np.asarray(one.dists), np.asarray(tiled.dists), atol=1e-6)
    g1 = jax.grad(lambda a: jnp.mean(knn_points(a, y, K=1).dists))(x)
    g2 = jax.grad(lambda a: jnp.mean(knn_points(a, y, K=1, tile=32, oneshot_elems=1).dists))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_knn_mask():
    rng = np.random.RandomState(1)
    x = rng.randn(10, 3).astype(np.float32)
    y = np.concatenate([rng.randn(5, 3), np.zeros((5, 3))]).astype(np.float32)
    y_mask = jnp.asarray([True] * 5 + [False] * 5)
    res = knn_points(jnp.asarray(x), jnp.asarray(y), K=2, y_mask=y_mask)
    assert (np.asarray(res.idx) < 5).all()


def test_chamfer_zero_for_identical():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(40, 3).astype(np.float32))
    assert float(chamfer_distance(x, x)) < 1e-6


def test_chamfer_gradient():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(30, 3).astype(np.float32))
    y = x + 0.1
    g = jax.grad(lambda a: chamfer_distance(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_edge_loss_unit_cube():
    verts, faces = _cube()
    edges = edges_from_faces(faces)
    # cube edges are length 1 (12) or sqrt2 (face diagonals, 6)
    loss = float(mesh_edge_loss(jnp.asarray(verts), jnp.asarray(edges)))
    lengths = np.linalg.norm(verts[edges[:, 0]] - verts[edges[:, 1]], axis=1)
    np.testing.assert_allclose(loss, (lengths**2).mean(), rtol=1e-5)


def test_laplacian_zero_for_planar_grid():
    # a flat regular grid has zero uniform Laplacian in the interior
    n = 5
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n, np.float32)], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.asarray(faces, dtype=np.int32)
    table, deg = laplacian_neighbors_from_faces(faces, n * n)
    loss = float(mesh_laplacian_smoothing(jnp.asarray(verts), jnp.asarray(table), jnp.asarray(deg)))
    # boundary rows contribute, interior are 0 — the loss is small but nonzero;
    # for a noisy grid it must be larger
    noisy = verts + np.random.RandomState(0).randn(*verts.shape).astype(np.float32) * 0.3
    loss_noisy = float(mesh_laplacian_smoothing(jnp.asarray(noisy), jnp.asarray(table), jnp.asarray(deg)))
    assert loss_noisy > loss


def test_normal_consistency_flat_vs_bent():
    verts, faces = _cube()
    adj = face_adjacency_from_faces(faces)
    loss_cube = float(mesh_normal_consistency(jnp.asarray(verts), jnp.asarray(adj)))
    # coplanar quad (two triangles): perfectly consistent normals → 0
    flat_v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32)
    flat_f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    flat_adj = face_adjacency_from_faces(flat_f)
    loss_flat = float(mesh_normal_consistency(jnp.asarray(flat_v), jnp.asarray(flat_adj)))
    assert loss_flat < 1e-6
    assert loss_cube > loss_flat


def test_sampling_on_surface_and_area_weighted():
    verts, faces = _cube()
    key = jax.random.PRNGKey(0)
    pts = sample_points_from_meshes(jnp.asarray(verts), jnp.asarray(faces), 2000, key)
    p = np.asarray(pts)
    assert p.shape == (2000, 3)
    # all samples on the cube surface: at least one coord ∈ {0, 1}
    on_face = np.any((np.abs(p) < 1e-5) | (np.abs(p - 1) < 1e-5), axis=1)
    assert on_face.all()
    # roughly uniform across the 6 sides
    counts = [
        (np.abs(p[:, ax] - v) < 1e-5).mean() for ax in range(3) for v in (0.0, 1.0)
    ]
    assert all(0.1 < c < 0.23 for c in counts), counts


def test_sampling_face_mask_and_boundary():
    """face_mask excludes faces from sampling even when they have nonzero
    area (padded target-mesh faces), and zero-weight faces are unselectable
    even at exact CDF boundaries (searchsorted side='right' convention)."""
    verts, faces = _cube()
    key = jax.random.PRNGKey(2)
    mask = np.ones(len(faces), np.float32)
    mask[:4] = 0.0  # exclude 4 real faces
    got = sample_points_from_meshes(
        jnp.asarray(verts), jnp.asarray(faces), 1500, key,
        return_normals=True, face_mask=jnp.asarray(mask),
    )
    fidx = np.asarray(got.face_idx)
    assert not np.isin(fidx, [0, 1, 2, 3]).any()

    # r == 0.0 exactly, with face 0 masked out: side='left' would pick face 0
    cdf = jnp.cumsum(jnp.asarray(mask) / mask.sum())
    i = int(jnp.searchsorted(cdf, 0.0, side="right"))
    assert i == 4


def test_sampling_differentiable():
    verts, faces = _cube()
    key = jax.random.PRNGKey(1)

    def f(v):
        pts = sample_points_from_meshes(v, jnp.asarray(faces), 100, key)
        return jnp.sum(pts**2)

    g = jax.grad(f)(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_thinness_scores_flat_vs_thin():
    """A thin plate's rim faces see both plate sides' opposing normals...
    simpler invariant: faces on a large flat grid score ~0; faces on a
    high-curvature zigzag score high (reference fitter_3d/utils.py:361)."""
    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.ops.mesh_ops import compute_thinness_scores

    def grid_mesh(zigzag):
        n = 8
        xs, ys = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32))
        z = (xs % 2) * 2.0 if zigzag else np.zeros_like(xs)
        verts = np.stack([xs, ys, z], -1).reshape(-1, 3)
        faces = []
        for i in range(n - 1):
            for j in range(n - 1):
                a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
                faces += [[a, b, c], [b, d, c]]
        return jnp.asarray(verts), jnp.asarray(np.asarray(faces, np.int32))

    v_flat, f = grid_mesh(False)
    v_zig, _ = grid_mesh(True)
    s_flat = np.asarray(compute_thinness_scores(v_flat, f, n_neighbors=12))
    s_zig = np.asarray(compute_thinness_scores(v_zig, f, n_neighbors=12))
    assert s_flat.max() < 1e-5
    assert s_zig.mean() > 0.1
    assert s_zig.mean() > s_flat.mean() + 0.1


def test_sampling_constant_folding_guard():
    """jit must match eager when batched verts+faces are closed-over constants.

    XLA's constant-folding evaluator mis-folds *batched* gathers (vmap-derived
    gather dimension numbers): v[f[:, 0]] over constant operands keeps only
    component 0 and zeroes the rest — on CPU and TPU backends (jax 0.9.0).
    This is exactly the shape of a fitter step that closes over its target
    meshes, and it silently corrupted every loss downstream. Guarded by the
    optimization_barrier in sample_points_from_meshes; this test is the
    distilled repro and must stay green if that barrier is ever removed.
    """
    rng = np.random.RandomState(7)
    verts = jnp.asarray(rng.randn(1, 60, 3).astype(np.float32))
    faces = jnp.asarray(rng.randint(0, 60, (1, 40, 3)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    def sample(v, f):
        return sample_points_from_meshes(v, f, 200, key)

    eager = jax.vmap(sample)(verts, faces)
    # closed-over constants + an unused traced arg → the whole sampling
    # subtree is foldable; without the barrier this returns garbage
    jitted = jax.jit(lambda _: jax.vmap(sample)(verts, faces))(0.0)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-6)


def test_knn_envelope_gradient_matches_full():
    """The envelope-gradient KNN (selection under stop_gradient, distances
    recomputed from the gather) must produce the same chamfer gradients as
    differentiating through the full distance matrix."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(40, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(50, 3).astype(np.float32)) + 0.3

    def chamfer(a, b):
        return jnp.mean(knn_points(a, b, K=1).dists) + jnp.mean(knn_points(b, a, K=1).dists)

    def chamfer_full(a, b):
        d = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
        return jnp.mean(d.min(1)) + jnp.mean(d.min(0))

    gx, gy = jax.grad(chamfer, argnums=(0, 1))(x, y)
    fx, fy = jax.grad(chamfer_full, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(fx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(fy), rtol=1e-4, atol=1e-6)
