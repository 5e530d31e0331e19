"""Single-view regressor training CLI — equivalent of the reference
``python -m smal_fitter.neuralSMIL.train_smil_regressor --config x.json``.

Data parallelism is a jax device mesh (no --num_gpus/torchrun machinery: all
local devices are used automatically; multi-host via jax.distributed).

Usage:
  python -m smilify_tpu.cli.train_regressor --config cfg.json \
      [--model path.pkl] [--data-path dir_or_h5] [--epochs N] [--set a.b=c ...]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_set_overrides(pairs):
    out = {}
    for p in pairs or []:
        key, _, val = p.partition("=")
        try:
            val = json.loads(val)
        except json.JSONDecodeError:
            pass
        out[key] = val
    return out


def build_dataset(cfg, spec):
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset, SingleViewHDF5Dataset, detect_dataset_type
    from smilify_tpu.data.replicant import ReplicantDataset

    res = cfg.model.input_resolution or 224
    if cfg.multi_dataset.enabled:
        # weighted multi-dataset mixing (reference CombinedSMILDataset)
        from smilify_tpu.data.combined import build_combined_from_config

        return build_combined_from_config(cfg, joint_names=spec.joint_names), "combined"
    path = cfg.dataset.data_path
    kind = detect_dataset_type(path)
    if kind == "replicant_raw":
        return ReplicantDataset(path, spec.joint_names, image_size=res), kind
    if kind.endswith("multiview") or kind == "sleap_multiview":
        if cfg.mode == "multi_view":
            return MultiViewHDF5Dataset(
                path,
                num_views_to_use=cfg.multiview.num_views_to_use,
                seed=cfg.training.seed,
            ), kind
        # single-view-from-multiview training: one view per item, optionally
        # every view (expand_all_views) and camera-anchored GT (camera_centric)
        # — reference sleap_multiview_dataset.py:48,67-72,298
        return MultiViewHDF5Dataset(
            path,
            return_single_view=True,
            camera_centric=cfg.dataset.frame_convention == "camera_centric",
            expand_all_views=cfg.dataset.expand_all_views,
            seed=cfg.training.seed,
        ), kind
    return SingleViewHDF5Dataset(path), kind


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train the single-view SMIL regressor")
    ap.add_argument("--config", default=None)
    ap.add_argument("--model", default=None, help="SMIL model .pkl")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--output-dir", default="runs/singleview")
    ap.add_argument("--resume", default=None, help="checkpoint name/path to resume")
    ap.add_argument("--allow-random-backbone", action="store_true",
                    help="permit freeze_backbone=true without model.pretrained_npz")
    ap.add_argument("--set", nargs="*", default=None, help="dotted config overrides a.b=c")
    ap.add_argument("--multihost", action="store_true",
                    help="force jax.distributed.initialize() (auto-detected from "
                         "SLURM/TPU-pod env otherwise)")
    args = ap.parse_args(argv)

    # must run before any other jax API use (reference setup_ddp ordering)
    from smilify_tpu.train.multihost import (
        is_primary,
        maybe_initialize_multihost,
        shard_dataset_for_process,
    )

    multihost = maybe_initialize_multihost(args.multihost)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.models.regressor import (
        SMILRegressor,
        compute_batch_loss,
        decode_predictions,
    )
    from smilify_tpu.train.config import load_config, resolve_model_spec
    from smilify_tpu.train.trainer import (
        StagingCollator,
        TrainState,
        build_optimizer,
        data_mesh,
        iterate_batches,
        make_train_step,
        replicate,
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
    cfg = load_config(args.config, overrides=overrides, mode="single_view")
    spec = resolve_model_spec(cfg)
    rcfg = cfg.regressor_config(spec)

    dataset, kind = build_dataset(cfg, spec)
    print(f"dataset: {kind}, {len(dataset)} samples; model J={spec.n_joints} B={spec.n_betas}")

    ratios = (cfg.dataset.train_ratio, cfg.dataset.val_ratio, cfg.dataset.test_ratio)
    if getattr(dataset, "item_sample_indices", None) is not None:
        from smilify_tpu.train.trainer import split_dataset_grouped

        tr_idx, val_idx, te_idx = split_dataset_grouped(
            dataset.item_sample_indices, ratios, cfg.training.seed
        )
    elif kind == "combined" and cfg.multi_dataset.validation_split_strategy == "per_dataset":
        from smilify_tpu.train.trainer import split_dataset_per_group

        tr_idx, val_idx, te_idx = split_dataset_per_group(
            dataset.group_ids, ratios, cfg.training.seed
        )
    else:
        tr_idx, val_idx, te_idx = split_dataset(len(dataset), ratios, cfg.training.seed)
    train_ds = SubsetDataset(dataset, tr_idx)
    val_ds = SubsetDataset(dataset, val_idx)
    if cfg.training.cache_decoded_samples:
        # decode-once cache UNDER the augmentation wrapper (augs resample per
        # epoch; the cached sample is the clean decode)
        from smilify_tpu.data.cache import DecodedSampleCache

        train_ds = DecodedSampleCache(train_ds, max_bytes=cfg.training.cache_max_bytes)
        val_ds = DecodedSampleCache(val_ds, max_bytes=cfg.training.cache_max_bytes)
    if cfg.augmentation.enabled:
        # on-the-fly train-split augmentation (reference augments inside the
        # dataset when augment=True; val/test stay clean)
        from smilify_tpu.data.augmentation import AugmentedDataset, params_from_config

        train_ds = AugmentedDataset(train_ds, params_from_config(cfg.augmentation),
                                    seed=cfg.training.seed, multiview=False)
        print("augmentation active (photometric"
              + ("+geometric" if cfg.augmentation.geometric_enabled else "") + ")")
    print(f"split: {len(train_ds)} train / {len(val_ds)} val / {len(te_idx)} test")

    res = cfg.model.input_resolution or 224
    model = SMILRegressor(rcfg)
    rng = jax.random.PRNGKey(cfg.training.seed)
    sample_imgs = jnp.zeros((2, res, res, 3))
    # jitted init: eager init dispatches every op individually — minutes over
    # the tunneled transport vs seconds compiled
    t_init = time.time()
    variables = jax.jit(model.init)(rng, sample_imgs)
    print(f"model initialized ({time.time() - t_init:.0f}s)")
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    from smilify_tpu.models.weight_port import apply_pretrained_policy

    params, batch_stats = apply_pretrained_policy(
        cfg, params, batch_stats, allow_random_backbone=args.allow_random_backbone
    )

    mesh = data_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    bs = cfg.training.batch_size
    if bs % n_dev:
        bs = max(n_dev, (bs // n_dev) * n_dev)
        print(f"batch_size rounded to {bs} for {n_dev} devices")
    multihost_run = multihost and jax.process_count() > 1
    if multihost_run:
        # per-host batch slice + disjoint wrap-padded dataset shard
        # (reference DistributedSampler semantics)
        bs, train_ds = shard_dataset_for_process(train_ds, bs)

    os.makedirs(args.output_dir, exist_ok=True)

    from smilify_tpu.train.config import (
        resolve_ignored_joint_indices,
        resolve_joint_importance,
    )

    joint_importance = resolve_joint_importance(cfg, spec)
    if joint_importance is not None:
        joint_importance = jnp.asarray(joint_importance)
        print(f"joint importance active: min={float(joint_importance.min())} "
              f"max={float(joint_importance.max())}")
    ignored_idx = resolve_ignored_joint_indices(cfg, spec.joint_names)

    def apply_fn(variables, batch, train):
        out, mutated = model.apply(
            variables, batch["image"], train=train,
            mutable=["batch_stats"] if train else [],
            rngs={"dropout": jax.random.PRNGKey(0)} if train else None,
        )
        raw, history = out
        preds = decode_predictions(rcfg, raw, spec)
        preds["ief_history"] = history
        new_stats = mutated.get("batch_stats", variables.get("batch_stats", {})) if train else None
        return preds, new_stats

    host_rng = np.random.default_rng(cfg.training.seed)
    # persistent staging buffers: avoids the tunneled-TPU per-batch
    # alloc/free pinning penalty (see StagingCollator)
    staging = StagingCollator()

    device_cache = val_cache = None
    if cfg.training.device_data_cache:
        if multihost_run or cfg.augmentation.enabled:
            print("device_data_cache disabled: needs a single-process mesh and "
                  "augmentation off — falling back to the host pipeline")
        else:
            from smilify_tpu.train.trainer import DeviceDataCache

            device_cache = DeviceDataCache(train_ds, mesh)
            if len(val_ds) >= bs:
                val_cache = DeviceDataCache(val_ds, mesh)
            print(f"device data cache: {len(train_ds)} train samples, "
                  f"{device_cache.bytes / 1e6:.0f} MB resident in HBM")
    state = TrainState(params=replicate(mesh, params), batch_stats=replicate(mesh, batch_stats),
                       opt_state=None)
    state, start_epoch = try_resume(
        args.output_dir, args.resume or cfg.training.resume_checkpoint, state,
        reset_ief_token_embedding=cfg.training.reset_ief_token_embedding,
    )

    current = {"weights": None, "lr": None, "frozen": None, "step_fn": None, "tx": None}

    def target_dict(batch):
        targets = {}
        for name in ("global_rot", "joint_rot", "betas", "trans", "fov", "cam_rot", "cam_trans",
                     "keypoints_3d", "silhouette"):
            if name in batch:
                targets[name] = batch[name]
        # datasets generated with a wider PCA space than the model's: supervise
        # the shared leading components only
        if "betas" in targets and targets["betas"].shape[-1] != spec.n_betas:
            targets["betas"] = targets["betas"][..., : spec.n_betas]
        # HDF5 single-view datasets store cam_rot flattened (9,); the loss
        # compares against the predicted (3, 3) matrix
        if "cam_rot" in targets and targets["cam_rot"].shape[-1] == 9:
            targets["cam_rot"] = targets["cam_rot"].reshape(
                targets["cam_rot"].shape[:-1] + (3, 3))
        if "fov" in targets and targets["fov"].ndim > 1:
            targets["fov"] = targets["fov"][..., 0]
        if "keypoints_2d" in batch:
            targets["keypoints_2d"] = batch["keypoints_2d"]
            vis = batch.get("keypoint_visibility")
            if vis is not None and ignored_idx:
                # ignored_joints: drop these joints from 2D supervision
                # (reference dataset_preprocessing.py:108-137 zeroes visibility)
                vis = vis * jnp.ones(vis.shape[-1]).at[jnp.asarray(ignored_idx)].set(0.0)
            targets["kp_visibility"] = vis
        return targets

    t_start = time.time()
    best_val = min((h.get("val_loss", float("inf")) for h in state.history),
                   default=float("inf"))
    for epoch in range(start_epoch, cfg.training.num_epochs):
        if hasattr(train_ds, "set_epoch"):
            train_ds.set_epoch(epoch)
        weights = cfg.get_loss_weights_for_epoch(epoch)
        lr = cfg.get_learning_rate_for_epoch(epoch)
        frozen = cfg.model.freeze_backbone and (
            cfg.model.backbone_unfreeze_epoch is None or epoch < cfg.model.backbone_unfreeze_epoch
        )
        if (weights, lr, frozen) != (current["weights"], current["lr"], current["frozen"]):
            tx = build_optimizer(cfg, lr, frozen)
            state.opt_state = replicate(mesh, tx.init(jax.device_get(state.params)))

            def loss_fn(preds, batch, w=dict(weights)):
                return compute_batch_loss(
                    spec, rcfg, preds, target_dict(batch), w, image_size=(res, res),
                    joint_importance=joint_importance,
                )

            from smilify_tpu.train.trainer import make_eval_step

            current.update(
                weights=weights, lr=lr, frozen=frozen, tx=tx,
                step_fn=make_train_step(apply_fn, loss_fn, tx,
                                        cfg.training.gradient_accumulation_steps),
                eval_fn=make_eval_step(apply_fn, loss_fn),
            )
            print(f"epoch {epoch}: lr={lr} frozen_backbone={frozen}")

        epoch_losses = []
        skipped = 0
        if device_cache is not None:
            batch_iter = device_cache.iterate(bs, host_rng,
                                              fraction=cfg.dataset.dataset_fraction)
        else:
            batch_iter = iterate_batches(train_ds, bs, host_rng,
                                         fraction=cfg.dataset.dataset_fraction,
                                         collate=staging,
                                         num_workers=cfg.training.num_workers,
                                         prefetch=cfg.training.prefetch_factor,
                                         worker_mode=cfg.training.worker_mode,
                                         skip_errors=True)
        for batch in batch_iter:
            # per-batch resilience (reference train_multiview_regressor.py:606)
            try:
                if device_cache is None:
                    host_batch = batch
                    batch = shard_batch(mesh, batch)
                    staging.guard(host_batch, batch)  # slot reuse waits for the transfer
                state.params, state.batch_stats, state.opt_state, loss, objs = current["step_fn"](
                    state.params, state.batch_stats, state.opt_state, batch
                )
                # keep the device scalar — float() here would synchronize and
                # serialize host loading against device compute
                epoch_losses.append(loss)
            except Exception as e:  # noqa: BLE001
                if multihost_run:
                    # a host-local skip desynchronizes the collective step
                    # (other hosts wait forever) — crash beats deadlock
                    raise
                skipped += 1
                print(f"warning: skipped batch ({type(e).__name__}: {e})")
                if skipped > max(4, len(epoch_losses)):
                    raise
        if skipped:
            print(f"epoch {epoch}: skipped {skipped} failing batches")
        if not epoch_losses:
            raise SystemExit("no batches — dataset smaller than batch size?")
        mean_loss = float(np.mean([float(l) for l in epoch_losses]))
        state.epoch = epoch
        state.history.append({"epoch": epoch, "loss": mean_loss, "lr": lr})
        for k, v in objs.items():
            state.history[-1][f"loss_{k}"] = float(v)
        print(f"epoch {epoch}: loss {mean_loss:.5f} ({len(epoch_losses)} steps, "
              f"{time.time()-t_start:.0f}s)")

        if len(val_ds) >= bs:
            val_losses = []
            if val_cache is not None:
                val_iter = val_cache.iterate(bs, host_rng, shuffle=False)
            else:
                val_iter = iterate_batches(val_ds, bs, host_rng, shuffle=False,
                                           fraction=1.0, collate=staging)
            for vb in val_iter:
                if val_cache is None:
                    host_vb = vb
                    vb = shard_batch(mesh, vb)
                    staging.guard(host_vb, vb)
                vloss, _ = current["eval_fn"](state.params, state.batch_stats, vb)
                val_losses.append(float(vloss))
            if val_losses:
                state.history[-1]["val_loss"] = float(np.mean(val_losses))
                print(f"epoch {epoch}: val_loss {state.history[-1]['val_loss']:.5f}")

        last_epoch = epoch == cfg.training.num_epochs - 1
        # host-side writes are process-0-only (reference rank==0 gating).
        # Under multihost the state arrays live on the GLOBAL mesh: a jit or
        # orbax save issued from process 0 alone would deadlock the others.
        # Replicated arrays are locally readable on every process, so take
        # host copies (no collective) and gate only the file writes.
        out_state = state
        if multihost_run:
            out_state = TrainState(
                params=jax.device_get(state.params),
                batch_stats=jax.device_get(state.batch_stats),
                opt_state=jax.device_get(state.opt_state),
                epoch=state.epoch, step=state.step, history=state.history)
        if is_primary() and ((epoch + 1) % cfg.output.generate_visualizations_every == 0
                             or last_epoch):
            from smilify_tpu.data.hdf5_dataset import collate_multiview as collate_plain
            from smilify_tpu.train.train_viz import epoch_visualization

            viz_ds = val_ds if len(val_ds) else train_ds
            vb = collate_plain([viz_ds[i] for i in
                                range(min(cfg.output.num_visualization_samples, len(viz_ds)))])
            if "image" in vb:
                ief_metrics = epoch_visualization(
                    spec, apply_fn, out_state.params, out_state.batch_stats, vb, (res, res),
                    args.output_dir, epoch, multiview=False,
                    viz_dir=cfg.output.train_visualizations_dir,
                )
                state.history[-1].update(ief_metrics)

        from smilify_tpu.train.trainer import end_of_epoch_outputs

        if is_primary():
            best_val = end_of_epoch_outputs(args.output_dir, out_state, cfg, epoch,
                                            last_epoch, best_val)

    return state


if __name__ == "__main__":
    main()
