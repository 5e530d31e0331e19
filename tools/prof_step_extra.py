"""Isolate where the config4b train step's time goes beyond the backbone
fwd+bwd: full-model gradient (train vs eval apply), standalone-Adam
dispatch overhead, and batch-size MFU scaling. Findings are recorded in
docs/PERFORMANCE.md §Neural stack (the step is gradient-bound; fused Adam
~1.3 ms; train-mode BN ~8.8 ms; donation unsupported on the tunnel)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from _timing import timeit_chain

from smilify_tpu.core.spec import load_model_spec
from smilify_tpu.models.regressor import (
    RegressorConfig, SMILRegressor, compute_batch_loss, decode_predictions,
)

STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
B = 128
GFLOP_FWD = 8.18 * B
V5E_BF16_PEAK_TFLOPS = 197.0


def report(name, dt, gflop=None):
    line = f"{name:44s} {dt*1e3:8.3f} ms   {B/dt:9.1f} img/s"
    if gflop:
        tf = gflop / dt / 1e3
        line += f"   {tf:6.1f} TFLOP/s ({tf/V5E_BF16_PEAK_TFLOPS*100:.0f}% bf16 peak)"
    print(line, flush=True)


def main():
    spec = load_model_spec(STICK, align_symmetry=False)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))

    cfg = RegressorConfig(backbone="resnet50", n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          decoder_dim=256, decoder_depth=4, ief_iters=3)
    model = SMILRegressor(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    weights = {"global_rot": 1.0, "joint_rot": 1.0, "betas": 0.5, "trans": 1.0,
               "keypoint_2d": 1.0}
    batch = {
        "image": img,
        "global_rot": jnp.zeros((B, 3)),
        "joint_rot": jnp.zeros((B, spec.n_joints - 1, 3)),
        "betas": jnp.asarray(np.tile(spec.shape_mean_betas, (B, 1))),
        "trans": jnp.zeros((B, 3)),
        "keypoints_2d": jnp.asarray(rng.rand(B, spec.n_joints, 2).astype(np.float32)),
        "kp_visibility": jnp.ones((B, spec.n_joints)),
    }

    def apply_fn(vs, bt, train):
        out, mutated = model.apply(
            vs, bt["image"], train=train, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        raw, history = out
        preds = decode_predictions(cfg, raw, spec)
        preds["ief_history"] = history
        return preds, mutated.get("batch_stats", {})

    def loss_fn(preds, bt):
        targets = {k: bt[k] for k in
                   ("global_rot", "joint_rot", "betas", "trans",
                    "keypoints_2d", "kp_visibility")}
        return compute_batch_loss(spec, cfg, preds, targets, weights,
                                  image_size=(224, 224))

    def compute(p, stats, bt):
        preds, new_stats = apply_fn({"params": p, "batch_stats": stats}, bt, True)
        total, objs = loss_fn(preds, bt)
        return total, (objs, new_stats)

    run_grad_sections = os.environ.get("PROF_GRAD_SECTIONS", "1") == "1"
    # 1. full-model value_and_grad only (no optimizer)
    @jax.jit
    def grad_chain(state):
        p, stats = state
        (loss, (_, new_stats)), grads = jax.value_and_grad(compute, has_aux=True)(p, stats, batch)
        p = jax.tree.map(lambda a, g: a - 1e-12 * g, p, grads)
        return p, new_stats

    if run_grad_sections:
        report("full model fwd+bwd (train, no opt)",
               timeit_chain(grad_chain, (params, batch_stats), n1=5, n2=20), 3 * GFLOP_FWD)

    # 1b. same but eval-mode apply (no BN stat updates, no dropout)
    def compute_eval(p, stats, bt):
        preds, _ = apply_fn({"params": p, "batch_stats": stats}, bt, False)
        total, objs = loss_fn(preds, bt)
        return total, objs

    @jax.jit
    def grad_eval_chain(p):
        (loss, _), grads = jax.value_and_grad(compute_eval, has_aux=True)(p, batch_stats, batch)
        return jax.tree.map(lambda a, g: a - 1e-12 * g, p, grads)

    if run_grad_sections:
        report("full model fwd+bwd (eval-mode apply)",
               timeit_chain(grad_eval_chain, params, n1=5, n2=20), 3 * GFLOP_FWD)

    # 2. Adam update alone
    grads0 = jax.jit(lambda p, s: jax.grad(compute, has_aux=True)(p, s, batch)[0])(
        params, batch_stats)

    @jax.jit
    def adam_chain(state):
        p, s = state
        updates, s = tx.update(grads0, s, p)
        p = optax.apply_updates(p, updates)
        return p, s

    report("Adam update alone", timeit_chain(adam_chain, (params, opt_state), n1=5, n2=50))

    # 3. full step, no donation (mirror of make_train_step)
    @jax.jit
    def step(p, stats, s, bt):
        (loss, (objs, new_stats)), grads = jax.value_and_grad(compute, has_aux=True)(p, stats, bt)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, new_stats, s, loss, objs

    def chain(state):
        p, stats, s = state
        p, stats, s, _, _ = step(p, stats, s, batch)
        return p, stats, s

    report("FULL step (no donation)",
           timeit_chain(chain, (params, batch_stats, opt_state), n1=5, n2=20), 3 * GFLOP_FWD)

    # NOTE: a donate_argnums=(0,1,2) variant of the step crashes the tunneled
    # TPU backend with INVALID_ARGUMENT on the first value fetch (2026-08-20);
    # donation is not usable on this transport, so it is not measured here.

    # 4. batch-256 step (MFU scaling with batch)
    B2 = 256
    batch2 = {
        "image": jnp.asarray(rng.rand(B2, 224, 224, 3).astype(np.float32)),
        "global_rot": jnp.zeros((B2, 3)),
        "joint_rot": jnp.zeros((B2, spec.n_joints - 1, 3)),
        "betas": jnp.asarray(np.tile(spec.shape_mean_betas, (B2, 1))),
        "trans": jnp.zeros((B2, 3)),
        "keypoints_2d": jnp.asarray(rng.rand(B2, spec.n_joints, 2).astype(np.float32)),
        "kp_visibility": jnp.ones((B2, spec.n_joints)),
    }

    def chain_d2(state):
        p, stats, s = state
        p, stats, s, _, _ = step(p, stats, s, batch2)
        return p, stats, s

    dt = timeit_chain(chain_d2, (params, batch_stats, opt_state), n1=5, n2=20)
    tf = 3 * 8.18 * B2 / dt / 1e3
    print(f"{'FULL step (batch 256)':44s} {dt*1e3:8.3f} ms   "
          f"{B2/dt:9.1f} img/s   {tf:6.1f} TFLOP/s ({tf/V5E_BF16_PEAK_TFLOPS*100:.0f}% bf16 peak)",
          flush=True)


if __name__ == "__main__":
    main()
