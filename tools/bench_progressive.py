"""Progressive (coarse-to-fine) vs fixed-resolution full-schedule fit.

Runs the COMPLETE reference OPT_WEIGHTS schedule (600 + 400 + 600 + 600
iterations) on a rendered-GT 512x512 target, fixed resolution vs the
--progressive 1,4,2,1 pyramid, and reports wall time + fit quality (IoU at
full resolution, mean keypoint error). Two passes each: pass 1 includes
(persistent-cache) compiles, pass 2 is the steady state.

Measured verdict (tools/progressive_bench.json, TPU v5e): the pyramid does
NOT pay — the fused step is not raster-dominated (3.36/2.10/2.42 ms/iter at
512/256/128 px warm), so progressive mode is shipped as a convergence knob
only. See smilify_tpu/fitter/progressive.py.

Usage: python tools/bench_progressive.py [--size 512] [--chunk 10]
Writes tools/progressive_bench.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def fit_quality(spec, fitter, data, image_size):
    from smilify_tpu.fitter.fitter import render_frame
    from smilify_tpu.render.cameras import default_camera

    verts, joints3d = fitter.forward_frames()
    cam = default_camera().replace(fov=fitter.params.fov[0])
    sil_r, kp_yx = render_frame(spec, cam, verts[0], joints3d[0], image_size)
    a = np.asarray(sil_r) > 0.5
    b = np.asarray(data.sil[0]) > 0.5
    iou = float((a & b).sum()) / max(1.0, float((a | b).sum()))
    kp_err = float(jnp.abs(kp_yx - data.joints[0]).mean())
    return iou, kp_err


def run(mode, spec, data, size, chunk, scales):
    from smilify_tpu.fitter.fitter import SmalFitter
    from smilify_tpu.fitter.progressive import ProgressiveFitter
    from smilify_tpu.fitter.stages import OPT_WEIGHTS

    if mode == "progressive":
        fitter = ProgressiveFitter(spec, data, (size, size), scales=scales)
    else:
        fitter = SmalFitter(spec, data, (size, size))
    t0 = time.time()
    fitter.fit(OPT_WEIGHTS, chunk=chunk)
    jax.block_until_ready(fitter.params.trans)
    wall = time.time() - t0
    iou, kp = fit_quality(spec, fitter, data, (size, size))
    return wall, iou, kp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--scales", default="1,4,2,1")
    args = ap.parse_args()

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.fitter.fitter import synthetic_fit_data

    spec = load_model_spec("/root/reference/3D_model_prep/SMILy_STICK.pkl",
                           align_symmetry=False)
    data = synthetic_fit_data(spec, 1, (args.size, args.size))
    scales = tuple(int(s) for s in args.scales.split(","))

    out = {"device": jax.devices()[0].device_kind, "size": args.size,
           "chunk": args.chunk, "scales": list(scales),
           "schedule_iters": [600, 400, 600, 600]}
    for mode in ("fixed", "progressive"):
        walls = []
        for p in range(2):
            wall, iou, kp = run(mode, spec, data, args.size, args.chunk, scales)
            walls.append(wall)
            print(f"{mode} pass{p}: {wall:.1f}s  IoU={iou:.4f}  kp={kp:.2f}px")
        out[mode] = {"wall_first_s": round(walls[0], 2),
                     "wall_steady_s": round(walls[1], 2),
                     "final_iou": round(iou, 4),
                     "final_kp_err_px": round(kp, 3)}
    out["steady_speedup"] = round(out["fixed"]["wall_steady_s"] /
                                  out["progressive"]["wall_steady_s"], 3)
    path = os.path.join(os.path.dirname(__file__), "progressive_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
