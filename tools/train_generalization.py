"""Generalization-grade trained models: held-out-split proofs on
model-matched synthetic data.

Unlike ``tools/prove_learning.py`` (which memorizes a dozen samples to prove
gradient flow), this trains the single-view and multi-view regressors on a
*real* train/val/test split of a synthetic dataset rendered from the bundled
model pkl itself — ground truth is exactly reachable (no asset-mismatch
keypoint floor, cf. BENCHMARK.md) — and benchmarks ONLY the held-out test
split via ``cli/benchmark_model.py --split test`` (the exact seeded indices
the trainer never saw). The reference's equivalent evidence is its trained
demo checkpoints that generalize across frames (README.md:17-25); its
report contract is neuralSMIL/README.md:306-340.

Gates (regression-tested by tests/test_learning.py::test_generalization_*):
  * held-out PCK@10px >= 0.9 (and PCK@5 reported),
  * multi-view additionally reports held-out MPJPE (mm).

Usage:
  python tools/train_generalization.py --mode sv [--epochs 300]
  python tools/train_generalization.py --mode mv [--epochs 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_PKL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"

SPLIT_RATIOS = "0.85,0.05,0.10"
SPLIT_SEED = 1234  # training.seed default — the trainer splits with this

# strong direct param supervision (see prove_learning.py rationale) with a
# two-stage keypoint_2d curriculum ramping toward the benchmarked metric
# (early kp2d gradients from off-screen projections are useless — ramp only
# once the param losses have localized the body)
_WEIGHTS = (
    'loss_curriculum.base_weights={"global_rot":1.0,"joint_rot":2.0,'
    '"betas":0.3,"trans":0.3,"fov":0.1,"cam_rot":2.0,"cam_trans":2.0,'
    '"log_beta_scales":0.1,"betas_trans":0.1,"keypoint_2d":0.05,'
    '"keypoint_3d":0.0,"silhouette":0.0,"joint_angle_regularization":0.0,'
    '"limb_scale_regularization":0.0,"limb_trans_regularization":0.0}'
)


def _dataset(mode: str, workdir: str, n_samples: int, resolution: int) -> str:
    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    n_views = 1 if mode == "sv" else 4
    seed = 11 if mode == "sv" else 13
    h5 = os.path.join(workdir, f"synth_{mode}_{n_samples}.h5")
    if not os.path.exists(h5):
        spec = load_model_spec(MODEL_PKL, align_symmetry=False)
        generate_synthetic_multiview(spec, h5, n_samples=n_samples, n_views=n_views,
                                     resolution=resolution, seed=seed)
    return h5


def _overrides(mode: str, epochs: int, lr: float, resolution: int):
    ov = [
        _WEIGHTS,
        f'loss_curriculum.curriculum_stages={{"{int(epochs * 0.25)}":'
        '{"keypoint_2d":0.3},'
        f'"{int(epochs * 0.6)}":{{"keypoint_2d":1.0}}}}',
        "model.backbone_name=unet_mid", f"model.input_resolution={resolution}",
        "model.transformer_depth=3", "model.transformer_heads=4",
        "model.freeze_backbone=false", "model.transformer_ief_iters=3",
        "model.transformer_dropout=0.0",
        f"optimizer.learning_rate={lr}",
        f'optimizer.lr_schedule={{"{int(epochs * 0.5)}":0.0003,'
        f'"{int(epochs * 0.77)}":0.0001,"{int(epochs * 0.93)}":0.00004}}',
        "training.batch_size=32", "training.num_workers=0",
        # whole dataset resident in HBM: per-step host traffic is an index
        # array (the tunneled chip's wire is ~10 MB/s — see DeviceDataCache)
        "training.device_data_cache=true",
        "dataset.dataset_fraction=1.0",
        f"dataset.train_ratio={SPLIT_RATIOS.split(',')[0]}",
        f"dataset.val_ratio={SPLIT_RATIOS.split(',')[1]}",
        f"dataset.test_ratio={SPLIT_RATIOS.split(',')[2]}",
        "augmentation.enabled=false",
        f"output.save_checkpoint_every={epochs}",
        "output.generate_visualizations_every=1000000",
        "output.plot_history_every=1000000",
    ]
    if mode == "mv":
        ov += ["training.batch_size=8",
               "multiview.num_views_to_use=4",
               "multiview.cross_attention_heads=4",
               "multiview.cross_attention_layers=2",
               "training.use_gt_camera_init=false"]
    return ov


def run(mode: str, epochs: int, workdir: str, lr: float = 1e-3,
        n_samples: int = None, resolution: int = 96,
        pck10_target: float = 0.9):
    sys.path.insert(0, REPO)
    os.makedirs(workdir, exist_ok=True)
    n_samples = n_samples or (1600 if mode == "sv" else 700)
    h5 = _dataset(mode, workdir, n_samples, resolution)

    out_dir = os.path.join(workdir, f"gen_{mode}")
    if mode == "sv":
        from smilify_tpu.cli.train_regressor import main as train_main
    else:
        from smilify_tpu.cli.train_multiview import main as train_main

    state = train_main([
        "--model", MODEL_PKL, "--data-path", h5,
        "--epochs", str(epochs), "--output-dir", out_dir,
        "--set", *_overrides(mode, epochs, lr, resolution),
    ])

    from smilify_tpu.cli.benchmark_model import main as bench_main

    acc = bench_main([
        "--checkpoint", os.path.join(out_dir, "final_model"),
        "--dataset-path", h5,
        "--output-dir", os.path.join(out_dir, "benchmark_heldout"),
        "--split", "test", "--split-ratios", SPLIT_RATIOS,
        "--split-seed", str(SPLIT_SEED),
    ])
    curve = acc.pck_curve("input")
    losses = [h["loss"] for h in state.history]
    result = {
        "mode": mode, "epochs": epochs, "n_samples": n_samples,
        "resolution": resolution, "split_ratios": SPLIT_RATIOS,
        "split_seed": SPLIT_SEED,
        "loss_first": losses[0], "loss_last": losses[-1],
        "val_loss_last": state.history[-1].get("val_loss"),
        "heldout_pck@5px": curve.get(5, 0.0),
        "heldout_pck@10px": curve.get(10, 0.0),
        "pck_ok": curve.get(10, 0.0) >= pck10_target,
    }
    if mode == "mv":
        result["heldout_mpjpe"] = acc.mpjpe_stats()
    with open(os.path.join(workdir, f"generalization_{mode}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["sv", "mv"], default="sv")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--workdir", default="runs")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-samples", type=int, default=None)
    args = ap.parse_args()
    r = run(args.mode, args.epochs, args.workdir, lr=args.lr,
            n_samples=args.n_samples)
    if not r["pck_ok"]:
        raise SystemExit(f"GENERALIZATION PROOF FAILED: {r}")
    print("GENERALIZATION-OK")


if __name__ == "__main__":
    main()
