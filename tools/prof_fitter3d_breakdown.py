"""Breakdown of the config2 bench step (ATTA scan registration): where do
the ~12 ms go — point sampling, chamfer KNN, mesh regularizers, or backward?
Runs each loss subset as its own fused fwd+bwd+Adam step, plus standalone
KNN timings at the chamfer shapes."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from smilify_tpu.core.spec import load_model_spec
from smilify_tpu.fitter.fitter3d import (
    init_3d_params, pad_target_meshes, registration_losses, template_topology,
)
from smilify_tpu.ops.knn import knn_points
from smilify_tpu.utils.export import load_obj

STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
ATTA_DIR = "/root/reference/fitter_3d/ATTA_BOI"


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import timeit_chain  # noqa: E402


def bench(name, chain, state, n1=8, n2=32):
    """Chained slope timing (tools/_timing): dependent dispatches + value
    fetches — weaker loops mis-measure on this box."""
    dt = timeit_chain(chain, state, n1=n1, n2=n2)
    print(f"{name:48s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    spec = load_model_spec(STICK, align_symmetry=False)
    obj = sorted(p for p in os.listdir(ATTA_DIR) if p.endswith(".obj"))[0]
    v, f = load_obj(os.path.join(ATTA_DIR, obj))
    targets = pad_target_meshes([(v, f)], ["atta"])
    topo = template_topology(spec)
    print(f"target verts={v.shape[0]} faces={f.shape[0]} template V={spec.n_verts}")

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(3000, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(3000, 3).astype(np.float32))
    @jax.jit
    def knn_fwd_chain(x):
        return x + knn_points(x, b, K=1).dists.mean() * 1e-9

    bench("knn 3000x3000 K=1 (fwd)", knn_fwd_chain, a)

    @jax.jit
    def knn_bwd_chain(x):
        g = jax.grad(lambda xx: knn_points(xx, b, K=1).dists.sum())(x)
        return x + g * 1e-9

    bench("knn 3000x3000 K=1 (fwd+bwd)", knn_bwd_chain, a)

    key = jax.random.PRNGKey(0)
    base = {"chamfer": 0.0, "edge": 0.0, "normal": 0.0, "laplacian": 0.0, "sdf": 0.0}
    full = {"chamfer": 1.0, "edge": 1.0, "normal": 0.01, "laplacian": 0.1, "sdf": 0.0}
    tx = optax.adam(1e-3)

    def make_step(lw):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                total, _ = registration_losses(
                    spec, topo, p, targets, key, lw, num_samples=3000)
                return total

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    for name, lw in (
        ("full loss step", full),
        ("chamfer only", {**base, "chamfer": 1.0}),
        ("edge+normal+laplacian only", {**base, "edge": 1.0, "normal": 0.01,
                                        "laplacian": 0.1}),
    ):
        params = init_3d_params(spec, 1)
        opt_state = tx.init(params)
        step = make_step(lw)

        def chain(state):
            p, s = state
            p, s, _ = step(p, s, key)
            return p, s

        bench(name, chain, (params, opt_state), n1=10, n2=40)


if __name__ == "__main__":
    main()
