"""Corpus-fitting throughput bench: BatchedFitter (S clips, one program) vs
S sequential SmalFitter runs — the reference's only option is one process per
clip (smal_fitter/optimize_to_joints.py), so its corpus throughput is the
single-clip rate at best.

Run on the TPU chip (default backend):
    python -u tools/bench_corpus.py [--clips 8] [--size 256] [--iters 40]

Prints one JSON line with batched/sequential step times and the speedup.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import sync

MODEL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"


def make_data(spec, S, N, H, W, seed=0):
    from smilify_tpu.fitter.fitter import FitData

    rng = np.random.RandomState(seed)
    shape = (S, N) if S else (N,)
    return FitData(
        rgb=None,
        sil=jnp.asarray((rng.rand(*shape, H, W) > 0.7).astype(np.float32)),
        joints=jnp.asarray(rng.rand(*shape, spec.n_joints, 2).astype(np.float32) * H),
        visibility=jnp.ones(shape + (spec.n_joints,)),
    )


def time_stage(fitter, stage_weights, chunk, warm_iters=1):
    """Wall time per optimization iteration of stage 1 (full loss, raster on)."""
    # warm: compile + first dispatch
    w = stage_weights._replace(num_iters=chunk * warm_iters)
    fitter.run_stage(1, w, chunk=chunk)
    n = chunk * 4
    w = stage_weights._replace(num_iters=n)
    t0 = time.perf_counter()
    fitter.run_stage(1, w, chunk=chunk)
    sync(fitter.params)  # value fetch: block_until_ready can return early here
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.fitter.fitter import SmalFitter
    from smilify_tpu.fitter.fitter_batch import BatchedFitter
    from smilify_tpu.fitter.stages import OPT_WEIGHTS

    spec = load_model_spec(MODEL, align_symmetry=False)
    S, N, H = args.clips, 1, args.size
    stage = OPT_WEIGHTS[1]

    # sequential baseline: ONE clip's per-iteration time (reference-style;
    # S clips sequentially cost S× this)
    single = SmalFitter(spec, make_data(spec, 0, N, H, H), (H, H))
    t_single = time_stage(single, stage, args.chunk)

    batched = BatchedFitter(spec, make_data(spec, S, N, H, H), (H, H))
    t_batched = time_stage(batched, stage, args.chunk)

    # batched throughput: S clips advance one iteration in t_batched
    clip_iters_batched = S / t_batched
    clip_iters_seq = 1.0 / t_single
    print(json.dumps({
        "clips": S, "frames_per_clip": N, "image": H, "chunk": args.chunk,
        "single_clip_iter_ms": round(t_single * 1e3, 3),
        "batched_step_ms": round(t_batched * 1e3, 3),
        "clip_iters_per_s_batched": round(clip_iters_batched, 1),
        "clip_iters_per_s_sequential": round(clip_iters_seq, 1),
        "speedup_vs_sequential": round(clip_iters_batched / clip_iters_seq, 2),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
