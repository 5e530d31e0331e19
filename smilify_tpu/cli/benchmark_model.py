"""Model benchmark CLI — equivalent of the reference
``python -m smal_fitter.neuralSMIL.benchmark_model --checkpoint … --dataset_path …``.

Auto-detects single/multi-view from the checkpoint, evaluates PCK@1..50px at
input (and native, when stored) resolution plus MPJPE (mm) for 3D-GT datasets,
and writes benchmark_report.txt, PCK curves, error histograms, and raw .npy
error arrays (reference output contract README.md:306-340).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Benchmark a trained SMIL regressor")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset-path", required=True)
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--split", choices=["all", "train", "val", "test"], default="all",
                    help="evaluate only one side of the trainer's seeded split "
                         "(same split functions + seed + ratios reproduce the "
                         "exact held-out indices the trainer never saw)")
    ap.add_argument("--split-ratios", default="0.8,0.1,0.1",
                    help="train,val,test ratios used at training time")
    ap.add_argument("--split-seed", type=int, default=1234,
                    help="training.seed used at training time")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.cli.run_inference import load_model_from_checkpoint
    from smilify_tpu.data.combined import open_dataset
    from smilify_tpu.models.regressor import forward_model, project_to_camera
    from smilify_tpu.train.benchmark import BenchmarkAccumulator

    model, cfg, rcfg, spec, params, batch_stats, meta = load_model_from_checkpoint(args.checkpoint)
    out_dir = args.output_dir or os.path.join(os.path.dirname(args.checkpoint) or ".", "benchmark")
    res = cfg.model.input_resolution or 224
    is_mv = cfg.mode == "multi_view"

    dataset = open_dataset(args.dataset_path, joint_names=spec.joint_names,
                           image_size=res if not args.dataset_path.endswith(".h5") else None)
    if not is_mv and "images" in dataset[0]:
        # single-view model on a multi-view store: one view per item
        # (reference single-view-from-multiview, sleap_multiview_dataset.py:298)
        from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

        dataset = MultiViewHDF5Dataset(args.dataset_path, return_single_view=True,
                                       expand_all_views=True)
    if args.split != "all":
        # reproduce the trainer's seeded split (same functions, same grouped
        # logic for expand_all_views item indexing — cli/train_regressor.py)
        from smilify_tpu.train.trainer import (
            split_dataset,
            split_dataset_grouped,
            SubsetDataset,
        )

        ratios = tuple(float(x) for x in args.split_ratios.split(","))
        if getattr(dataset, "item_sample_indices", None) is not None:
            tr, va, te = split_dataset_grouped(dataset.item_sample_indices, ratios,
                                               args.split_seed)
        else:
            tr, va, te = split_dataset(len(dataset), ratios, args.split_seed)
        idx = {"train": tr, "val": va, "test": te}[args.split]
        dataset = SubsetDataset(dataset, idx)
        print(f"split={args.split}: {len(dataset)} samples "
              f"(ratios {ratios}, seed {args.split_seed})")
    n = len(dataset) if args.max_samples is None else min(len(dataset), args.max_samples)
    print(f"benchmarking {n} samples ({'multi' if is_mv else 'single'}-view)")

    acc = BenchmarkAccumulator()

    @jax.jit
    def predict_sv(imgs):
        variables = {"params": params, "batch_stats": batch_stats}
        (raw, _), _ = model.apply(variables, imgs, train=False, mutable=["batch_stats"])
        from smilify_tpu.models.regressor import decode_predictions

        preds = decode_predictions(rcfg, raw, spec)
        # honor the training-time world convention: dropping use_ue_scaling
        # here silently evaluated replicAnt-convention models in model units
        # (round-4 bug — the GT floor itself misses by 10x without it)
        verts, joints3d = forward_model(spec, preds,
                                        use_ue_scaling=rcfg.use_ue_scaling)
        kp2d = project_to_camera(preds, joints3d, (res, res))
        return kp2d, joints3d

    @jax.jit
    def predict_mv(imgs, vm, cids):
        variables = {"params": params, "batch_stats": batch_stats}
        (raw, _), _ = model.apply(variables, imgs, vm, cids, train=False, mutable=["batch_stats"])
        from smilify_tpu.models.multiview import (
            decode_multiview_predictions,
            project_through_view_cameras,
        )

        preds = decode_multiview_predictions(rcfg, raw, spec)
        verts, joints3d = forward_model(spec, preds,
                                        use_ue_scaling=rcfg.use_ue_scaling)
        kp2d = project_through_view_cameras(preds, joints3d, (res, res))
        return kp2d, joints3d

    from smilify_tpu.train.trainer import StagingCollator

    bs = args.batch_size
    # persistent staging buffers for device-bound arrays (tunneled-TPU
    # per-batch alloc/free pinning penalty — see StagingCollator)
    staging = StagingCollator()
    dev_keys = ("images", "view_mask", "camera_indices") if is_mv else ("image",)
    for i in range(0, n, bs):
        samples = [dataset[j] for j in range(i, min(n, i + bs))]
        dev = staging([{k: s[k] for k in dev_keys} for s in samples])
        if is_mv:
            kp_pred, j3d_pred = predict_mv(dev["images"], dev["view_mask"],
                                           dev["camera_indices"])
            # store pixel (x, y) → normalized (y, x)
            gt2d = np.stack([s["keypoints_2d"] for s in samples])[..., ::-1] / res
            vis = np.stack([s["keypoint_visibility"] for s in samples])
            vis = vis * np.stack([s["view_mask"] for s in samples])[..., None]
            acc.add_2d(np.asarray(kp_pred), gt2d, vis, res)
            has3d = np.array([s.get("has_3d_data", False) for s in samples])
            if has3d.any():
                gt3d = np.stack([s["keypoints_3d"] for s in samples])
                acc.add_3d(np.asarray(j3d_pred)[has3d], gt3d[has3d])
        else:
            kp_pred, j3d_pred = predict_sv(dev["image"])
            gt2d = np.stack([s["keypoints_2d"] for s in samples])
            vis = np.stack([s["keypoint_visibility"] for s in samples])
            acc.add_2d(np.asarray(kp_pred), gt2d, vis, res)
            if all("keypoints_3d" in s for s in samples):
                gt3d = np.stack([s["keypoints_3d"] for s in samples])
                acc.add_3d(np.asarray(j3d_pred), gt3d)

    report = acc.write_report(out_dir, title=f"benchmark: {args.checkpoint}")
    print(report)
    print(f"→ {out_dir}")
    return acc


if __name__ == "__main__":
    main()
