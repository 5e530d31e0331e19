"""Backward-filter-conv ceiling experiments (round-5 follow-up to the
round-4 GroupNorm experiment, docs/PERFORMANCE.md §Neural stack).

Round 4 attributed the 31% train-MFU ceiling of the b128 resnet50 train step
to the backward-filter convolutions (grad-wrt-input-only backprop 37 ms vs
49 ms true gradient) and named layout/padding/remat experiments as the next
attack. This script runs them, one variant per PROCESS (XLA flags bind at
backend init):

  python tools/exp_backward_conv.py baseline
  python tools/exp_backward_conv.py remat        # nn.remat every Bottleneck
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python tools/exp_backward_conv.py baseline  # bigger scoped vmem
  python tools/exp_backward_conv.py all          # orchestrates subprocesses

`remat` rematerializes each Bottleneck in the backward pass: the step is
HBM-bound (batch 256 showed no MFU gain), so trading activation reads/writes
for recompute is the textbook lever. Results append to
tools/exp_backward_conv.json; the conclusion lands in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tools", "exp_backward_conv.json")

VARIANTS = {
    "baseline": {},
    "remat": {},
    "vmem64": {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"},
    "remat_vmem64": {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"},
}


def run_variant(name: str):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from flax import linen as nn

    import smilify_tpu.models.backbones as bb

    if name.startswith("remat"):
        # remat the block CLASS before any model construction: ResNet looks
        # the name up at call time, so every Bottleneck recomputes its
        # activations in the backward pass instead of storing them
        bb.Bottleneck = nn.remat(bb.Bottleneck)

    from smilify_tpu.core.spec import load_model_spec
    from tools.bench_all import bench_singleview_train_step

    spec = load_model_spec("/root/reference/3D_model_prep/SMILy_STICK.pkl",
                           align_symmetry=False)
    res = bench_singleview_train_step(spec)
    res["variant"] = name
    res["xla_flags"] = os.environ.get("XLA_FLAGS", "")
    print(json.dumps(res, indent=2))

    data = []
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data.append(res)
    json.dump(data, open(OUT, "w"), indent=2)
    return res


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all":
        return run_variant(which)
    for name, env in VARIANTS.items():
        e = dict(os.environ)
        e.update(env)
        print(f"=== {name} {env} ===", flush=True)
        subprocess.run([sys.executable, "-u", __file__, name], env=e, cwd=REPO,
                       check=True)


if __name__ == "__main__":
    main()
