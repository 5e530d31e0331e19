"""Demo artifact: a trained checkpoint driving the full inference→render path.

Generates a SMOOTH synthetic sequence (cosine-interpolated keyframes from the
same distribution the generalization models were trained on), runs the
trained single-view regressor over it with ``cli/run_inference.py``, and
exports the side-by-side overlay video — the analogue of the reference
README's trained-demo GIFs (/root/reference/README.md:17-25).

Usage:
  python tools/make_demo_video.py --checkpoint runs/gen_sv/final_model \
      --out benchmarks/gen_r5/demo_sv.mp4 [--frames 96]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_PKL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="runs/gen_sv/final_model")
    ap.add_argument("--out", default="benchmarks/gen_r5/demo_sv.mp4")
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--resolution", type=int, default=96)
    ap.add_argument("--workdir", default="runs")
    args = ap.parse_args()
    sys.path.insert(0, REPO)

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    h5 = os.path.join(args.workdir, f"demo_seq_{args.frames}.h5")
    if not os.path.exists(h5):
        spec = load_model_spec(MODEL_PKL, align_symmetry=False)
        generate_synthetic_multiview(
            spec, h5, n_samples=args.frames, n_views=1,
            resolution=args.resolution, seed=99, keyframe_every=16,
        )

    from smilify_tpu.cli.run_inference import main as infer_main

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    infer_main([
        "--checkpoint", args.checkpoint,
        "--data-path", h5,
        "--video", args.out,
        "--smooth-window", "3",
    ])
    print(f"demo video → {args.out}")


if __name__ == "__main__":
    main()
