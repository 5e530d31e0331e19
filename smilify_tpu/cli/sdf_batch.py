"""Batch SDF computation CLI — equivalent of the reference
``fitter_3d/SDF_batch.py``: compute the Spatial Diameter Function for every
``.obj`` in a directory (ray-cast sampling + kNN smoothing + per-vertex
assignment) and store results as a pickle consumable by the 3D registration's
SDF loss (``fitter_3d/optimise.py:113-171``).

Usage:
  python -m smilify_tpu.cli.sdf_batch --mesh_dir <dir> --output sdf_values.pkl \
      [--num-samples 1000] [--num-rays 30] [--smooth-k 100] [--assign-k 10]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batch spatial-diameter-function computation")
    ap.add_argument("--mesh_dir", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--num-samples", type=int, default=1000)
    ap.add_argument("--num-rays", type=int, default=30)
    ap.add_argument("--smooth-k", type=int, default=100)
    ap.add_argument("--assign-k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.ops.sdf import assign_vertex_sdf, compute_sdf, smooth_sdf
    from smilify_tpu.utils.export import load_obj

    paths = sorted(glob.glob(os.path.join(args.mesh_dir, "*.obj")))
    if not paths:
        raise SystemExit(f"no .obj files in {args.mesh_dir}")
    out_path = args.output or os.path.join(args.mesh_dir, "sdf_values.pkl")

    key = jax.random.PRNGKey(args.seed)
    results = {}
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        verts, faces = load_obj(p)
        t0 = time.time()
        key, sub = jax.random.split(key)
        pts, diam = compute_sdf(
            jnp.asarray(verts), jnp.asarray(faces), sub,
            num_samples=args.num_samples, num_rays=args.num_rays,
        )
        smoothed = smooth_sdf(pts, diam, k=min(args.smooth_k, args.num_samples))
        vertex_sdf = assign_vertex_sdf(jnp.asarray(verts), pts, smoothed, k=args.assign_k)
        results[name] = {
            "vertex_sdf": np.asarray(vertex_sdf),
            "sample_points": np.asarray(pts),
            "sample_sdf": np.asarray(smoothed),
        }
        print(f"{name}: V={len(verts)} F={len(faces)} "
              f"sdf range [{float(vertex_sdf.min()):.4f}, {float(vertex_sdf.max()):.4f}] "
              f"({time.time()-t0:.1f}s)")

    with open(out_path, "wb") as f:
        pickle.dump(results, f)
    print(f"→ {out_path} ({len(results)} meshes)")
    return out_path


if __name__ == "__main__":
    main()
