"""Collect the round-5 generalization artifacts into benchmarks/gen_r5/.

Copies the held-out benchmark reports, the generalization result JSONs, the
training-history plots and a visualization collage from the run dirs into the
committed benchmarks tree (checkpoints stay out of git — the reproduce
commands in benchmarks/gen_r5/README.md regenerate them).
"""

from __future__ import annotations

import glob
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, "benchmarks", "gen_r5")


def collect(mode: str, run_dir: str):
    src = os.path.join(REPO, run_dir)
    if not os.path.isdir(src):
        print(f"skip {mode}: {src} missing")
        return
    out = os.path.join(DST, mode)
    os.makedirs(out, exist_ok=True)
    bench = os.path.join(src, "benchmark_heldout")
    for f in glob.glob(os.path.join(bench, "*")):
        if f.endswith((".txt", ".png")):
            shutil.copy2(f, out)
    for f in glob.glob(os.path.join(src, "plots", "*.png"))[:3]:
        shutil.copy2(f, out)
    viz = sorted(glob.glob(os.path.join(src, "visualizations_train", "*.png")))
    if viz:
        shutil.copy2(viz[-1], os.path.join(out, "final_epoch_collage.png"))
    js = os.path.join(REPO, "runs", f"generalization_{mode}.json")
    if os.path.exists(js):
        shutil.copy2(js, os.path.join(DST, f"generalization_{mode}.json"))
    print(f"collected {mode} -> {out}")


if __name__ == "__main__":
    os.makedirs(DST, exist_ok=True)
    collect("sv", "runs/gen_sv")
    collect("mv", "runs/gen_mv")
