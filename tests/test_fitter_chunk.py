"""Chunked stage execution: a lax.scan chain of K optimization iterations per
dispatch must match per-iteration dispatch (same math, same Adam trajectory),
including the non-divisible remainder path and per-iteration callbacks."""

import pytest
import numpy as np
import jax.numpy as jnp

from smilify_tpu.fitter.fitter import FitData, SmalFitter
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.train.multidevice import toy_model_spec


def _make_fitter(spec):
    rng = np.random.RandomState(3)
    H = W = 64
    N = 2
    data = FitData(
        rgb=None,
        sil=jnp.asarray((rng.rand(N, H, W) > 0.8).astype(np.float32)),
        joints=jnp.asarray(rng.rand(N, spec.n_joints, 2).astype(np.float32) * H),
        visibility=jnp.ones((N, spec.n_joints)),
    )
    return SmalFitter(spec, data, (H, W))


@pytest.mark.smoke
def test_chunked_stage_matches_single_steps():
    spec = toy_model_spec()
    weights = StageWeights(
        num_iters=5, lr=1e-2, w_j2d=1.0, w_reproj=0.5, w_betas=0.1,
        w_pose=0.0, w_limit=0.0, w_splay=0.0, w_temp=0.1,
    )

    seen = {1: [], 3: []}
    results = {}
    for chunk in (1, 3):  # 5 iters at chunk 3 → chained 3 + remainder 1+1
        fitter = _make_fitter(spec)
        fitter.run_stage(
            1, weights, chunk=chunk,
            callback=lambda s, it, loss, objs, c=chunk: seen[c].append(
                (it, float(loss))),
        )
        results[chunk] = fitter.params

    # callbacks fired once per iteration, in order, with matching losses
    assert [it for it, _ in seen[1]] == [0, 1, 2, 3, 4]
    assert [it for it, _ in seen[3]] == [0, 1, 2, 3, 4]
    l1 = np.asarray([l for _, l in seen[1]])
    l3 = np.asarray([l for _, l in seen[3]])
    np.testing.assert_allclose(l1, l3, rtol=2e-4)

    import jax

    flat1, _ = jax.tree.flatten(results[1])
    flat3, _ = jax.tree.flatten(results[3])
    for a, b in zip(flat1, flat3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_fitter3d_chunked_matches_single_steps():
    """Chunked StageManager.run — same key recurrence, same trajectory."""
    import jax

    from smilify_tpu.fitter.fitter3d import Stage, StageManager, pad_target_meshes
    from smilify_tpu.train.multidevice import toy_model_spec

    spec = toy_model_spec()
    target_v = np.asarray(spec.v_template) + np.array([0.2, 0.1, -0.1], np.float32)
    targets = pad_target_meshes([(target_v, np.asarray(spec.faces))], ["self"])

    seen = {1: [], 2: []}
    results = {}
    for chunk in (1, 2):  # 5 iters at chunk 2 → 2 + 2 + remainder 1
        mgr = StageManager(spec, targets, seed=0)
        mgr.add_stage(Stage(
            "init", "init", n_its=5, lr=0.05,
            loss_weights={"chamfer": 1.0, "edge": 0.0, "normal": 0.0,
                          "laplacian": 0.0, "sdf": 0.0},
            num_samples=256,
        ))
        mgr.run(chunk=chunk,
                callback=lambda s, it, loss, objs, c=chunk: seen[c].append((it, loss)))
        results[chunk] = mgr.params

    assert [it for it, _ in seen[1]] == [0, 1, 2, 3, 4]
    assert [it for it, _ in seen[2]] == [0, 1, 2, 3, 4]
    np.testing.assert_allclose([l for _, l in seen[1]], [l for _, l in seen[2]],
                               rtol=2e-4)
    flat1, _ = jax.tree.flatten(results[1])
    flat2, _ = jax.tree.flatten(results[2])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_param_signature_stable_under_optimizer_step():
    """A weak-typed param leaf (python-scalar fill without explicit dtype)
    becomes strongly typed after one optimizer step, which changes the jit
    input signature and silently doubles every step compile (~7 s per extra
    compile measured on v5e). Guard both properties: init_params produces
    only strong leaves, and one Adam step preserves the full signature."""
    import jax
    import optax

    from smilify_tpu.fitter.fitter import init_params
    from smilify_tpu.fitter.priors import shape_prior_from_spec

    spec = toy_model_spec()
    params = init_params(spec, 2, shape_prior_from_spec(spec))
    for leaf in jax.tree.leaves(params):
        assert not leaf.weak_type, f"weak-typed init leaf {leaf.shape} {leaf.dtype}"

    tx = optax.adam(1e-3)
    state = tx.init(params)

    def sig(tree):
        return [(x.dtype, x.shape, x.weak_type) for x in jax.tree.leaves(tree)]

    @jax.jit
    def step(p, s):
        grads = jax.grad(
            lambda q: sum(jnp.sum(x**2) for x in jax.tree.leaves(q))
        )(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    p1, s1 = step(params, state)
    assert sig(p1) == sig(params)
    assert sig(s1) == sig(state)
