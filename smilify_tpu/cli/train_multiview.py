"""Multi-view regressor training CLI — equivalent of the reference
``python -m smal_fitter.neuralSMIL.train_multiview_regressor --config x.json
--num_gpus N`` (the mesh replaces torchrun/mp.spawn; all devices are used).

Usage:
  python -m smilify_tpu.cli.train_multiview --config cfg.json \
      --model <pkl> --data-path <multiview.h5> [--epochs N] [--set a.b=c ...]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train the multi-view SMIL regressor")
    ap.add_argument("--config", default=None)
    ap.add_argument("--model", default=None)
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--output-dir", default="runs/multiview")
    ap.add_argument("--resume", default=None, help="checkpoint name/path to resume")
    ap.add_argument("--set", nargs="*", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.cli.train_regressor import parse_set_overrides
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset, collate_multiview
    from smilify_tpu.models.multiview import (
        MultiViewSMILRegressor,
        compute_multiview_batch_loss,
        decode_multiview_predictions,
    )
    from smilify_tpu.core.rotations import matrix_to_axis_angle
    from smilify_tpu.render.cameras import camera_from_opencv
    from smilify_tpu.train.config import load_config, resolve_model_spec
    from smilify_tpu.train.trainer import (
        TrainState,
        build_optimizer,
        data_mesh,
        iterate_batches,
        make_train_step,
        replicate,
        save_checkpoint,
        shard_batch,
        split_dataset,
        SubsetDataset,
        try_resume,
    )

    overrides = parse_set_overrides(args.set)
    if args.data_path:
        overrides["dataset.data_path"] = args.data_path
    if args.epochs is not None:
        overrides["training.num_epochs"] = args.epochs
    if args.model:
        overrides["smal_model.smal_file"] = args.model
    cfg = load_config(args.config, overrides=overrides, mode="multi_view")
    spec = resolve_model_spec(cfg)
    rcfg = cfg.regressor_config(spec)

    dataset = MultiViewHDF5Dataset(
        cfg.dataset.data_path,
        num_views_to_use=cfg.multiview.num_views_to_use,
        view_sampling=cfg.multiview.view_sampling,
        seed=cfg.training.seed,
    )
    res = dataset.target_resolution
    V = cfg.multiview.num_views_to_use
    print(f"multiview dataset: {len(dataset)} samples, max_views={V}, res={res}, "
          f"world_scale={dataset.world_scale}")

    tr_idx, val_idx, te_idx = split_dataset(
        len(dataset),
        (cfg.dataset.train_ratio, cfg.dataset.val_ratio, cfg.dataset.test_ratio),
        cfg.training.seed,
    )
    train_ds = SubsetDataset(dataset, tr_idx)
    val_ds = SubsetDataset(dataset, val_idx)
    print(f"split: {len(train_ds)} train / {len(val_ds)} val / {len(te_idx)} test")

    model = MultiViewSMILRegressor(rcfg)
    rng = jax.random.PRNGKey(cfg.training.seed)
    variables = model.init(
        rng, jnp.zeros((1, V, res, res, 3)), jnp.ones((1, V), bool), jnp.zeros((1, V), jnp.int32)
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    mesh = data_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    bs = max(n_dev, (cfg.training.batch_size // n_dev) * n_dev)
    os.makedirs(args.output_dir, exist_ok=True)

    H = W = res

    def batch_to_view_cams(batch):
        """GT OpenCV cameras → our convention for camera-delta init and targets."""
        import jax

        def one(Rcv, tcv, Kcv):
            cam = camera_from_opencv(Rcv, tcv, Kcv, (H, W))
            return cam.R, cam.T, cam.fov

        R, T, fov = jax.vmap(jax.vmap(one))(
            batch["camera_extrinsics_R"], batch["camera_extrinsics_t"], batch["camera_intrinsics"]
        )
        return {"view_cam_rot": R, "view_cam_trans": T, "view_fov": fov}

    def apply_fn(variables, batch, train):
        (raw, hist), mutated = model.apply(
            variables, batch["images"], batch["view_mask"], batch["camera_indices"],
            train=train, mutable=["batch_stats"] if train else [],
            rngs={"dropout": jax.random.PRNGKey(0)} if train else None,
        )
        preds = decode_multiview_predictions(rcfg, raw, spec)
        new_stats = mutated.get("batch_stats", variables.get("batch_stats", {})) if train else None
        return preds, new_stats

    host_rng = np.random.default_rng(cfg.training.seed)
    state = TrainState(params=replicate(mesh, params), batch_stats=replicate(mesh, batch_stats),
                       opt_state=None)
    state, start_epoch = try_resume(args.output_dir, args.resume, state)
    current = {"key": None, "step_fn": None, "tx": None}

    def make_loss(weights):
        def loss_fn(preds, batch):
            gt_cams = batch_to_view_cams(batch)
            targets = {
                "global_rot": batch["global_rot"],
                "joint_rot": batch["joint_rot"],
                "betas": batch["betas"][..., : spec.n_betas],
                "trans": batch["trans"],
                "keypoints_2d": batch["keypoints_2d"] / jnp.asarray([H, W], jnp.float32),
                "kp_visibility": batch["keypoint_visibility"],
                "keypoints_3d": batch["keypoints_3d"],
                **gt_cams,
            }
            return compute_multiview_batch_loss(
                spec, rcfg, preds, targets, batch["view_mask"], weights, image_size=(H, W)
            )

        return loss_fn

    t0 = time.time()
    for epoch in range(start_epoch, cfg.training.num_epochs):
        weights = cfg.get_loss_weights_for_epoch(epoch)
        lr = cfg.get_learning_rate_for_epoch(epoch)
        frozen = cfg.model.freeze_backbone and (
            cfg.model.backbone_unfreeze_epoch is None or epoch < cfg.model.backbone_unfreeze_epoch
        )
        key = (tuple(sorted(weights.items())), lr, frozen)
        if key != current["key"]:
            tx = build_optimizer(cfg, lr, frozen)
            state.opt_state = replicate(mesh, tx.init(jax.device_get(state.params)))
            from smilify_tpu.train.trainer import make_eval_step

            loss_fn = make_loss(dict(weights))
            current.update(key=key, tx=tx,
                           step_fn=make_train_step(apply_fn, loss_fn, tx,
                                                   cfg.training.gradient_accumulation_steps),
                           eval_fn=make_eval_step(apply_fn, loss_fn))
            print(f"epoch {epoch}: lr={lr} frozen_backbone={frozen}")

        losses = []
        for batch in iterate_batches(train_ds, bs, host_rng, fraction=cfg.dataset.dataset_fraction,
                                     collate=collate_multiview):
            batch = shard_batch(mesh, batch)
            state.params, state.batch_stats, state.opt_state, loss, objs = current["step_fn"](
                state.params, state.batch_stats, state.opt_state, batch
            )
            losses.append(float(loss))
        if not losses:
            raise SystemExit("no batches — dataset smaller than batch size?")
        state.epoch = epoch
        mean_loss = float(np.mean(losses))
        state.history.append({"epoch": epoch, "loss": mean_loss, "lr": lr})
        for k, v in objs.items():
            state.history[-1][f"loss_{k}"] = float(v)
        print(f"epoch {epoch}: loss {mean_loss:.5f} ({len(losses)} steps, {time.time()-t0:.0f}s)")

        if len(val_ds) >= bs:
            val_losses = []
            for vb in iterate_batches(val_ds, bs, host_rng, shuffle=False, fraction=1.0):
                vb = shard_batch(mesh, vb)
                vloss, _ = current["eval_fn"](state.params, state.batch_stats, vb)
                val_losses.append(float(vloss))
            if val_losses:
                state.history[-1]["val_loss"] = float(np.mean(val_losses))
                print(f"epoch {epoch}: val_loss {state.history[-1]['val_loss']:.5f}")

        if (epoch + 1) % cfg.output.save_checkpoint_every == 0 or epoch == cfg.training.num_epochs - 1:
            save_checkpoint(args.output_dir, state, cfg, name="final_model")
            from smilify_tpu.train.trainer import plot_training_history

            plot_training_history(state.history, os.path.join(args.output_dir, "plots"))
            print("checkpoint saved")

    return state


if __name__ == "__main__":
    main()
