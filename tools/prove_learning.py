"""Prove the neural stack LEARNS — not merely survives.

Trains the single-view and multi-view regressors to memorization on a small
synthetic ground-truth dataset (images rendered from known SMIL parameters),
then asserts via the benchmark harness that

  * training loss decreased >= 20x from epoch 0, and
  * PCK@5px >= 0.7 AND PCK@10px >= 0.9 on the training samples
    (see the threshold rationale note in ``run``).

A silently-broken gradient path (e.g. through the camera heads) caps PCK far
below that, so this run fails loudly — the learning analogue of the GT-zero
self-test (losses == 0 at ground truth). The reference's equivalent evidence
is its trained demo models (README.md:17-25, GETTING_STARTED.md:40-95).

Used by tests/test_learning.py (slow) and runnable standalone:
  python tools/prove_learning.py --mode sv [--epochs 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_PKL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"


# memorization-proof loss weights: strong direct param supervision (the
# default production weights lean on keypoint_2d, whose early gradients come
# from wildly off-screen projections and dominate uselessly at init)
_PROOF_WEIGHTS = (
    'loss_curriculum.base_weights={"global_rot":1.0,"joint_rot":2.0,'
    '"betas":0.3,"trans":0.3,"fov":0.1,"cam_rot":2.0,"cam_trans":2.0,'
    '"log_beta_scales":0.1,"betas_trans":0.1,"keypoint_2d":0.05,'
    '"keypoint_3d":0.0,"silhouette":0.0,"joint_angle_regularization":0.0,'
    '"limb_scale_regularization":0.0,"limb_trans_regularization":0.0}'
)


def _common_overrides(lr: float):
    return [
        _PROOF_WEIGHTS,
        "model.backbone_name=unet_small", "model.input_resolution=64",
        "model.transformer_depth=2", "model.transformer_heads=2",
        "model.freeze_backbone=false", "model.transformer_ief_iters=3",
        "model.transformer_dropout=0.0",
        f"optimizer.learning_rate={lr}",
        # decay for the memorization tail (oscillation otherwise plateaus
        # joint_rot around 0.2 raw MSE)
        'optimizer.lr_schedule={"150":0.0003,"300":0.0001,"450":0.00004}',
        "training.batch_size=8", "training.num_workers=0",
        "dataset.dataset_fraction=1.0",
        # train on (nearly) everything; we benchmark memorization on the same
        # samples — the point is gradient flow, not generalization
        "dataset.train_ratio=0.99", "dataset.val_ratio=0.0",
        "dataset.test_ratio=0.01",
        "augmentation.enabled=false",
        "output.save_checkpoint_every=1000000",
        "output.generate_visualizations_every=1000000",
        "output.plot_history_every=1000000",
    ]


def run(mode: str, epochs: int, workdir: str, lr: float = 1e-3,
        n_samples: int = 12, pck5_target: float = 0.7, pck10_target: float = 0.9,
        loss_ratio: float = 20.0):
    sys.path.insert(0, REPO)
    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    os.makedirs(workdir, exist_ok=True)
    h5 = os.path.join(workdir, "learn_synth.h5")
    if not os.path.exists(h5):
        spec = load_model_spec(MODEL_PKL, align_symmetry=False)
        generate_synthetic_multiview(spec, h5, n_samples=n_samples, n_views=2,
                                     resolution=64, seed=7)

    out_dir = os.path.join(workdir, f"run_{mode}")
    overrides = _common_overrides(lr)
    if mode == "sv":
        from smilify_tpu.cli.train_regressor import main as train_main
    else:
        from smilify_tpu.cli.train_multiview import main as train_main

        # same --set list (a second --set would replace the first: nargs="*")
        overrides += ["training.batch_size=4",  # 10 train samples -> 2 steps/epoch
                      "multiview.num_views_to_use=2",
                      "multiview.cross_attention_heads=2",
                      "multiview.cross_attention_layers=1",
                      "training.use_gt_camera_init=false"]
    # final_model must exist for the benchmark step
    overrides[overrides.index("output.save_checkpoint_every=1000000")] = (
        f"output.save_checkpoint_every={epochs}")
    args = [
        "--model", MODEL_PKL, "--data-path", h5,
        "--epochs", str(epochs), "--output-dir", out_dir,
        "--set", *overrides,
    ]
    state = train_main(args)

    losses = [h["loss"] for h in state.history]
    first, last = losses[0], min(losses[-3:]) if len(losses) >= 3 else losses[-1]
    ratio = first / max(last, 1e-12)

    from smilify_tpu.cli.benchmark_model import main as bench_main

    acc = bench_main(["--checkpoint", os.path.join(out_dir, "final_model"),
                      "--dataset-path", h5,
                      "--output-dir", os.path.join(out_dir, "benchmark")])
    curve = acc.pck_curve("input")
    pck5, pck10 = curve.get(5, 0.0), curve.get(10, 0.0)

    # Why 0.7/0.9 and not 0.9@5px: at 64^2 input 5 px is 7.8% of the image,
    # and the residual concentrates in kinematic-tail extremities (tarsus/
    # antenna tips, 2-7 observations each; tuned run: PCK@5 0.85, PCK@10
    # 0.94, mean 3.3 px, loss ratio 1881x). A broken gradient path lands far
    # below these gates (observed: PCK@5 0.0-0.3, ratio 1.4).
    result = {
        "mode": mode, "epochs": epochs, "n_samples": n_samples,
        "loss_first": first, "loss_last": last, "loss_ratio": ratio,
        "pck@5px": pck5, "pck@10px": pck10,
        "loss_ok": ratio >= loss_ratio,
        "pck_ok": pck5 >= pck5_target and pck10 >= pck10_target,
    }
    with open(os.path.join(workdir, f"learning_{mode}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["sv", "mv"], default="sv")
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--workdir", default="/tmp/prove_learning")
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()
    r = run(args.mode, args.epochs, args.workdir, lr=args.lr)
    if not (r["loss_ok"] and r["pck_ok"]):
        raise SystemExit(f"LEARNING PROOF FAILED: {r}")
    print("LEARNING-OK")


if __name__ == "__main__":
    main()
