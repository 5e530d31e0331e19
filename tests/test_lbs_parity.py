"""Golden parity of the JAX SMIL forward vs the reference torch implementation.

Fixtures in tests/fixtures/smal_forward_*.npz were produced by
tools/gen_reference_fixtures.py running the reference on CPU. Tolerance is
loose-ish (1e-4 absolute on coordinates ~O(1)) because the reference runs f32
torch and we run f32 XLA with different reduction orders.
"""

import numpy as np
import pytest

from tests.conftest import FIXTURES

from tests._cpu_pin import cpu_pinned

pytestmark = cpu_pinned()  # dispatch-bound: CPU-subprocess on TPU runs

import jax.numpy as jnp

from smilify_tpu.core.lbs import batch_rodrigues, global_rigid_transformation, smil_forward

ATOL = 2e-4
RTOL = 1e-4


def _load(name):
    path = FIXTURES / f"smal_forward_{name}.npz"
    if not path.exists():
        pytest.skip(f"fixture {path} missing (run tools/gen_reference_fixtures.py)")
    return np.load(path)


@pytest.mark.parametrize("name", ["stick", "mouse", "mouse_repose_long"])
def test_rodrigues_parity(name):
    fx = _load(name)
    theta = fx["theta"]
    Rs = np.asarray(batch_rodrigues(jnp.asarray(theta.reshape(-1, 3)))).reshape(fx["rodrigues_Rs"].shape)
    np.testing.assert_allclose(Rs, fx["rodrigues_Rs"], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name", ["stick", "mouse", "mouse_repose_long"])
def test_fk_parity(name, request):
    fx = _load(name)
    Rs = jnp.asarray(fx["rodrigues_Rs"])
    Js = jnp.asarray(fx["fk_Js"])
    parents = jnp.asarray(fx["parents"].astype(np.int32))
    log_scales = jnp.asarray(fx["log_scales"])

    import jax

    newJ, A = jax.vmap(
        lambda r, j, s: global_rigid_transformation(r, j, parents, log_scales=s)
    )(Rs, Js, log_scales)
    np.testing.assert_allclose(np.asarray(newJ), fx["fk_newJ"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(A), fx["fk_A"], atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize(
    "name,fixture",
    [("stick", "stick_spec"), ("mouse", "mouse_spec"),
     ("mouse_repose_long", "mouse_repose_long_spec")],
)
def test_forward_parity(name, fixture, request):
    spec = request.getfixturevalue(fixture)
    fx = _load(name)
    betas = jnp.asarray(fx["betas"])
    theta = jnp.asarray(fx["theta"])
    trans = jnp.asarray(fx["trans"])
    log_scales = jnp.asarray(fx["log_scales"])
    betas_trans = jnp.asarray(fx["betas_trans"])

    # template must match the reference's (ignore_sym path)
    np.testing.assert_allclose(np.asarray(spec.v_template), fx["v_template"], atol=1e-6)

    # case A — plain
    out = smil_forward(spec, betas, theta, trans)
    np.testing.assert_allclose(np.asarray(out.verts), fx["vertsA"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out.joints), fx["jointsA"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out.Rs), fx["RsA"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.v_shaped), fx["v_shapedA"], atol=ATOL, rtol=RTOL)

    # case B — per-joint log scales with parent cancellation
    out = smil_forward(spec, betas, theta, trans, log_scales=log_scales)
    np.testing.assert_allclose(np.asarray(out.verts), fx["vertsB"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out.joints), fx["jointsB"], atol=ATOL, rtol=RTOL)

    # case C — scale propagation
    out = smil_forward(spec, betas, theta, trans, log_scales=log_scales, propagate_scaling=True)
    np.testing.assert_allclose(np.asarray(out.verts), fx["vertsC"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out.joints), fx["jointsC"], atol=ATOL, rtol=RTOL)

    # case D — per-joint translation offsets (Unreal y-flip)
    out = smil_forward(spec, betas, theta, trans, log_scales=log_scales, joint_trans=betas_trans)
    np.testing.assert_allclose(np.asarray(out.verts), fx["vertsD"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out.joints), fx["jointsD"], atol=ATOL, rtol=RTOL)

    # case E — zero betas (reference batch-1 branch)
    out = smil_forward(spec, jnp.zeros((1, 0)), theta[:1], trans[:1])
    np.testing.assert_allclose(np.asarray(out.verts), fx["vertsE"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(out.joints), fx["jointsE"], atol=ATOL, rtol=RTOL)


def test_forward_jit_and_grad(stick_spec):
    """The full forward must be jittable and differentiable end-to-end."""
    import jax

    spec = stick_spec
    N, J, B = 2, spec.n_joints, spec.n_betas

    def loss(betas, theta, trans):
        out = smil_forward(spec, betas, theta, trans)
        return jnp.sum(out.verts**2) + jnp.sum(out.joints**2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    betas = jnp.zeros((N, B))
    theta = jnp.full((N, J, 3), 0.1)
    trans = jnp.zeros((N, 3))
    gb, gt, gtr = g(betas, theta, trans)
    assert np.isfinite(np.asarray(gb)).all()
    assert np.isfinite(np.asarray(gt)).all()
    assert np.isfinite(np.asarray(gtr)).all()
    assert float(jnp.abs(gt).sum()) > 0


def test_all_bundled_models_load_and_run():
    """Every bundled model family loads through one spec path and runs the
    forward (mouse REPOSE variants included)."""
    import glob

    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.core.spec import load_model_spec

    for pkl in sorted(glob.glob("/root/reference/3D_model_prep/*.pkl")):
        spec = load_model_spec(pkl, align_symmetry=False)
        out = smil_forward(spec, jnp.zeros((1, spec.n_betas)),
                           jnp.zeros((1, spec.n_joints, 3)))
        v = np.asarray(out.verts)
        assert np.isfinite(v).all(), pkl
        assert v.std() > 1e-4, pkl  # a real mesh, not degenerate


def test_cyclic_kintree_fails_fast():
    """A corrupt parent array with a cycle must raise, not hang the
    pointer-jumping schedule builder."""
    import pytest

    from smilify_tpu.core.lbs import _jump_schedule

    with pytest.raises(ValueError, match="cyclic"):
        _jump_schedule((0, 2, 1))  # 1 <-> 2 cycle
    # a valid chain still builds
    assert len(_jump_schedule((0, 0, 1, 2))) >= 1
