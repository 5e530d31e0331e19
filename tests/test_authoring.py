"""Model-authoring tests: PCA shape spaces, entangled PCA, J_regressor,
pkl export/import round-trip through the real loader, beta calculator."""

from tests._cpu_pin import cpu_pinned

pytestmark = cpu_pinned()  # tiny-numerics/pkl IO: 489s over the tunnel vs seconds on CPU

import numpy as np
import pytest

from smilify_tpu.utils.authoring import (
    compute_entangled_pca,
    compute_pca_shape_space,
    export_model_pkl,
    j_regressor_from_weights,
    validate_model_dict,
)


def _synthetic_meshes(n=20, V=50, B=3, seed=0):
    """Meshes generated from a known linear space."""
    rng = np.random.RandomState(seed)
    template = rng.randn(V, 3)
    basis = rng.randn(B, V * 3)
    basis /= np.linalg.norm(basis, axis=1, keepdims=True)
    coeffs = rng.randn(n, B) * [2.0, 1.0, 0.5]
    meshes = template.reshape(-1) + coeffs @ basis
    return meshes.reshape(n, V, 3), template, basis, coeffs


def test_pca_shape_space_recovers_subspace():
    meshes, template, basis, coeffs = _synthetic_meshes()
    space = compute_pca_shape_space(meshes, n_components=3)
    V = meshes.shape[1]
    # reconstruction through the recovered space must be near-exact
    flat = meshes.reshape(len(meshes), -1)
    mean = space["v_template"].reshape(-1)
    sd = space["shapedirs"].reshape(V * 3, 3).T  # (B, 3V)
    recon = mean + space["betas"] @ sd
    np.testing.assert_allclose(recon, flat, atol=1e-8)
    assert space["shape_cov"].shape == (3, 3)


def test_entangled_pca_produces_dirs():
    rng = np.random.RandomState(1)
    n, V, J, B = 16, 30, 8, 2
    verts = rng.randn(n, V, 3)
    scales = rng.randn(n, J, 3) * 0.1
    trans = rng.randn(n, J, 3) * 0.05
    space = compute_entangled_pca(verts, scales, trans, n_components=B)
    assert space["scaledirs"].shape == (B, J, 3)
    assert space["transdirs"].shape == (B, J, 3)
    # the component directions must be orthogonal in the stacked space
    sd = space["shapedirs"].reshape(V * 3, B).T
    flat_scale = space["scaledirs"].reshape(B, -1)
    flat_trans = space["transdirs"].reshape(B, -1)
    stacked = np.concatenate([sd, flat_scale, flat_trans], axis=1)
    gram = stacked @ stacked.T
    np.testing.assert_allclose(gram, np.diag(np.diag(gram)), atol=1e-8)


def test_j_regressor_from_weights():
    rng = np.random.RandomState(2)
    V, J = 40, 5
    w = rng.rand(V, J)
    reg = j_regressor_from_weights(w, top_k=8)
    assert reg.shape == (J, V)
    np.testing.assert_allclose(reg.sum(axis=1), 1.0, atol=1e-9)
    assert (reg > 0).sum(axis=1).max() <= 8


def test_export_import_roundtrip(tmp_path):
    """An authored pkl must load through the real ModelSpec loader."""
    from smilify_tpu.core.spec import load_model_spec

    rng = np.random.RandomState(3)
    V, J, B = 24, 4, 2
    v = rng.randn(V, 3)
    faces = np.array([[i, (i + 1) % V, (i + 2) % V] for i in range(0, V - 2, 2)], np.int32)
    weights = np.abs(rng.rand(V, J))
    weights /= weights.sum(axis=1, keepdims=True)
    reg = j_regressor_from_weights(weights)
    kintree = np.stack([np.array([-1, 0, 1, 1]), np.arange(J)]).astype(np.int32)
    sd = rng.randn(V, 3, B)

    path = str(tmp_path / "authored.pkl")
    export_model_pkl(
        path, v, faces, reg, kintree, weights,
        J_names=[f"j{i}" for i in range(J)],
        shapedirs=sd,
        shape_cov=np.eye(B),
        shape_mean_betas=np.zeros(B),
    )
    spec = load_model_spec(path, align_symmetry=False, spatial_sort_faces=False)
    assert spec.n_verts == V and spec.n_joints == J and spec.n_betas == B
    np.testing.assert_allclose(np.asarray(spec.v_template), v, atol=1e-6)
    assert spec.joint_names == ("j0", "j1", "j2", "j3")

    # and the forward runs
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward

    out = smil_forward(spec, jnp.zeros((1, B)), jnp.zeros((1, J, 3)))
    assert np.isfinite(np.asarray(out.verts)).all()


def test_validate_model_dict_catches_errors():
    dd = {"v_template": np.zeros((10, 3)), "f": np.zeros((4, 3), int)}
    problems = validate_model_dict(dd)
    assert any("J_regressor" in p for p in problems)

    dd = {
        "v_template": np.zeros((10, 3)),
        "f": np.array([[0, 1, 99]]),
        "J_regressor": np.zeros((2, 10)),
        "kintree_table": np.zeros((2, 2), int),
        "weights": np.zeros((10, 2)),
    }
    problems = validate_model_dict(dd)
    assert any("out of range" in p for p in problems)


def test_beta_calculator(stick_spec):
    """Gauss-Newton recovers betas that reproduce measured distances."""
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.utils.beta_calculator import betas_from_measurements, measure

    spec = stick_spec
    rng = np.random.RandomState(0)
    gt_betas = rng.randn(spec.n_betas) * 0.5
    out = smil_forward(spec, jnp.asarray(gt_betas[None], jnp.float32),
                       jnp.zeros((1, spec.n_joints, 3)))
    verts_gt = np.asarray(out.v_shaped[0])

    measurements = {f"m{i}": (int(a), int(b)) for i, (a, b) in enumerate(
        rng.randint(0, spec.n_verts, (12, 2)))}
    targets = measure(verts_gt, measurements)
    betas = betas_from_measurements(spec, targets, measurements, n_iters=5)
    # achieved measurements must match targets closely
    v0 = np.asarray(spec.v_template, np.float64)
    dirs = np.asarray(spec.shapedirs, np.float64).T.reshape(v0.shape[0], 3, spec.n_betas)
    achieved = measure(v0 + dirs @ betas, measurements)
    for k in targets:
        assert abs(achieved[k] - targets[k]) < 0.01, (k, achieved[k], targets[k])


def test_pose_corrective_offsets_matches_lbs_blendshape(stick_spec):
    """The authoring-side corrective evaluation must match the LBS forward's
    pose-blendshape term (addon apply_pose_correctives, :643)."""
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.utils.authoring import pose_corrective_offsets

    spec = stick_spec
    if spec.posedirs is None or np.asarray(spec.posedirs).size == 0:
        import pytest

        pytest.skip("model has no posedirs")
    rng = np.random.RandomState(0)
    jr = rng.randn(spec.n_joints - 1, 3) * 0.2
    off = pose_corrective_offsets(np.asarray(spec.posedirs), jr)
    assert off.shape == (spec.n_verts, 3)

    theta = jnp.asarray(np.concatenate([np.zeros((1, 1, 3)), jr[None]], axis=1), jnp.float32)
    betas = jnp.zeros((1, spec.n_betas))
    posed = smil_forward(spec, betas, theta)
    rest = smil_forward(spec, betas, jnp.zeros_like(theta))
    # v_shaped differs exactly by the pose blendshape offsets
    got = np.asarray(posed.v_shaped[0] - rest.v_shaped[0])
    np.testing.assert_allclose(got, off, atol=2e-5)


def test_make_symmetrical():
    from smilify_tpu.utils.authoring import make_symmetrical

    rng = np.random.RandomState(0)
    right = rng.rand(20, 3) + [0, 0.2, 0]
    left = right * [1, -1, 1] + rng.randn(20, 3) * 0.004  # slightly asymmetric
    center = rng.rand(4, 3) * [1, 0.001, 1]
    verts = np.concatenate([right, left, center])
    out = make_symmetrical(verts, axis="y", center_tolerance=0.005)
    # center vertices snapped to the plane
    np.testing.assert_allclose(out[40:, 1], 0.0)
    # mirrored copy equals itself → perfectly symmetric
    mirrored = out * [1, -1, 1]
    d = np.linalg.norm(out[:, None] - mirrored[None], axis=-1).min(axis=1)
    assert d.max() < 1e-9


def test_measurement_exports(tmp_path, stick_spec):
    import csv

    from smilify_tpu.utils.authoring import (
        export_joint_distances_csv,
        export_mesh_measurements_csv,
        mesh_surface_area,
        mesh_volume,
    )

    # unit cube sanity: area 6, volume 1
    v = np.array([[0,0,0],[1,0,0],[1,1,0],[0,1,0],[0,0,1],[1,0,1],[1,1,1],[0,1,1]], float)
    f = np.array([[0,2,1],[0,3,2],[4,5,6],[4,6,7],[0,1,5],[0,5,4],
                  [1,2,6],[1,6,5],[2,3,7],[2,7,6],[3,0,4],[3,4,7]], np.int32)
    assert abs(mesh_surface_area(v, f) - 6.0) < 1e-6
    assert abs(mesh_volume(v, f) - 1.0) < 1e-6

    jd = export_joint_distances_csv(stick_spec, str(tmp_path / "jd.csv"), beta_range=1.0)
    with open(jd) as fh:
        rows = list(csv.reader(fh))
    J, B = stick_spec.n_joints, stick_spec.n_betas
    assert len(rows) == 1 + J * (J - 1) // 2
    assert len(rows[0]) == 2 + 1 + 2 * B
    assert float(rows[1][2]) > 0

    mm = export_mesh_measurements_csv(stick_spec, str(tmp_path / "mm.csv"), beta_range=1.0)
    with open(mm) as fh:
        rows = list(csv.reader(fh))
    assert len(rows) == 1 + 1 + 2 * B
    area0, vol0 = float(rows[1][1]), float(rows[1][2])
    assert area0 > 0 and vol0 > 0
    # beta variation changes the measurements
    assert any(abs(float(r[1]) - area0) > 1e-6 for r in rows[2:])
