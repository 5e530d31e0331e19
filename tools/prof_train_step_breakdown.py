"""Breakdown of the config4b bench step (single-view resnet50 train step at
batch 128): backbone fwd, backbone fwd+bwd, full model fwd, loss suite, and
the complete train step — to localize the cost and the MXU path's MFU.

All timings use tools/_timing.timeit_chain (dependent chains + value-fetch
slope — see that module for why nothing weaker is trustworthy here)."""
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
from smilify_tpu.models.backbones import ResNet
from smilify_tpu.models.regressor import (
    RegressorConfig, SMILRegressor, compute_batch_loss, decode_predictions,
)
from smilify_tpu.train.trainer import make_train_step

STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
B = 128
# resnet50 ≈ 4.09 GMACs/img at 224² → 8.18 GFLOP fwd, ~3x for fwd+bwd
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

    # --- bare backbone ---
    bb = ResNet(stage_sizes=(3, 4, 6, 3))
    bvars = jax.jit(bb.init)(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def fwd_chain(x):
        out = bb.apply(bvars, x, train=False).pooled
        return x * (1.0 - 1e-5) + jnp.mean(out).astype(x.dtype) * 1e-7

    report("backbone fwd (eval)", timeit_chain(fwd_chain, img), GFLOP_FWD)

    def bb_loss(p, bs, x):
        out, _ = bb.apply({"params": p, "batch_stats": bs}, x, train=True,
                          mutable=["batch_stats"])
        return jnp.sum(out.pooled.astype(jnp.float32) ** 2)

    @jax.jit
    def bwd_chain(x):
        g = jax.grad(bb_loss, argnums=2)(bvars["params"], bvars["batch_stats"], x)
        return x * (1.0 - 1e-5) + g * 1e-9

    report("backbone fwd+bwd (train)", timeit_chain(bwd_chain, img), 3 * GFLOP_FWD)

    # --- full regressor ---
    cfg = RegressorConfig(backbone="resnet50", n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          decoder_dim=256, decoder_depth=4, ief_iters=3)
    model = SMILRegressor(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def apply_fn(variables, batch, train):
        out, mutated = model.apply(
            variables, batch["image"], train=train, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        raw, history = out
        preds = decode_predictions(cfg, raw, spec)
        preds["ief_history"] = history
        return preds, mutated.get("batch_stats", {})

    @jax.jit
    def model_chain(x):
        preds, _ = apply_fn(variables, {"image": x}, False)
        return x * (1.0 - 1e-5) + jnp.mean(preds["trans"]) * 1e-7

    report("full model fwd (backbone+IEF head)", timeit_chain(model_chain, img))

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

    def loss_fn(preds, batch):
        targets = {k: batch[k] for k in
                   ("global_rot", "joint_rot", "betas", "trans",
                    "keypoints_2d", "kp_visibility")}
        return compute_batch_loss(spec, cfg, preds, targets, weights,
                                  image_size=(224, 224))

    preds0, _ = jax.jit(lambda v, b: apply_fn(v, b, False))(variables, batch)

    @jax.jit
    def loss_chain(preds):
        loss, _ = loss_fn(preds, batch)
        return {**preds, "trans": preds["trans"] * (1.0 - 1e-5) + loss * 1e-9}

    report("loss suite fwd (incl LBS+projection)", timeit_chain(loss_chain, preds0))

    def step_variants(w, name):
        def lf(preds, batch):
            targets = {k: batch[k] for k in
                       ("global_rot", "joint_rot", "betas", "trans",
                        "keypoints_2d", "kp_visibility")}
            return compute_batch_loss(spec, cfg, preds, targets, w,
                                      image_size=(224, 224))

        step = make_train_step(apply_fn, lf, tx)

        def chain(state):
            p, bs, s = state
            p, bs, s, _, _ = step(p, bs, s, batch)
            return p, bs, s

        report(name, timeit_chain(chain, (params, batch_stats, opt_state),
                                  n1=5, n2=20), 3 * GFLOP_FWD)

    step_variants(weights, "FULL train step (fwd+bwd+Adam)")
    step_variants({k: v for k, v in weights.items() if k != "keypoint_2d"},
                  "train step w/o kp2d loss (no LBS)")


if __name__ == "__main__":
    main()
