"""Self-supervised point-cloud→SMIL training CLI.

Equivalent of the reference ``fitter_3d/pointcloud2smil`` training entry
(train_model:1073): samples random SMIL configurations each step (no dataset
files needed), samples surface point clouds, and trains PointNet/PointNet++
to regress the parameters back, with a curriculum that grows the pose/shape
sampling scales over epochs (smil_pointnet.py:737).

Usage:
  python -m smilify_tpu.cli.train_pointnet --model <pkl> [--arch pointnet2]
      [--epochs 10] [--steps-per-epoch 50] [--batch 8] [--points 1024]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Self-supervised PointNet SMIL regression")
    ap.add_argument("--model", required=True)
    ap.add_argument("--arch", default="pointnet", choices=["pointnet", "pointnet2"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--output-dir", default="runs/pointnet")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.models.pointnet import (
        PointNetConfig,
        SMILPointNet,
        clouds_from_params,
        pointnet_loss,
        sample_smil_configs,
    )
    from smilify_tpu.train.trainer import TrainState, save_checkpoint
    from smilify_tpu.train.config import TrainingConfig

    spec = load_model_spec(args.model, align_symmetry=False)
    cfg = PointNetConfig(arch=args.arch, n_pose=spec.n_joints - 1,
                         n_betas=spec.n_betas, n_joints=spec.n_joints)
    model = SMILPointNet(cfg)
    key = jax.random.PRNGKey(args.seed)
    key, k0 = jax.random.split(key)
    variables = model.init(k0, jnp.zeros((2, args.points, 3)))
    params = variables["params"]

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    # curriculum over sampling scales (reference smil_pointnet.py:737)
    def scales_for_epoch(e):
        frac = min(1.0, (e + 1) / max(args.epochs // 2, 1))
        return 0.05 + 0.15 * frac, 0.2 + 0.6 * frac

    @jax.jit
    def step(params, opt_state, key, pose_scale, beta_scale):
        k1, k2, k3 = jax.random.split(key, 3)
        gt = sample_smil_configs(spec, args.batch, k1, pose_scale, beta_scale)
        clouds, gt_joints = clouds_from_params(spec, gt, args.points, k2)

        def loss_fn(p):
            raw = model.apply({"params": p}, clouds)
            return pointnet_loss(spec, cfg, raw, gt, gt_joints, clouds, key=k3)

        (loss, objs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, objs

    os.makedirs(args.output_dir, exist_ok=True)
    t0 = time.time()
    state = TrainState(params=params, batch_stats={}, opt_state=opt_state)
    for epoch in range(args.epochs):
        ps, bs = scales_for_epoch(epoch)
        losses = []
        for _ in range(args.steps_per_epoch):
            key, sub = jax.random.split(key)
            state.params, state.opt_state, loss, objs = step(
                state.params, state.opt_state, sub, ps, bs
            )
            losses.append(float(loss))
        state.epoch = epoch
        mean_loss = float(np.mean(losses))
        state.history.append({"epoch": epoch, "loss": mean_loss})
        print(f"epoch {epoch}: loss {mean_loss:.5f} (pose_scale={ps:.3f} beta_scale={bs:.3f}, "
              f"{time.time()-t0:.0f}s)")
    save_checkpoint(args.output_dir, state, TrainingConfig(), name="final_model")
    print(f"checkpoint → {args.output_dir}/final_model")
    return state


if __name__ == "__main__":
    main()
