"""3D mesh-registration CLI — equivalent of the reference
``python -m fitter_3d.optimise`` (fitter_3d/optimise.py:183-325).

YAML-configured stages fit the SMIL template to a directory of target ``.obj``
scans, optionally split into batches; per-stage/final results are saved as
``.npz`` and batch results merged.

Usage:
  python -m smilify_tpu.cli.optimise_3d --model <pkl> --mesh_dir <dir> \
      --yaml_src cfg.yaml [--results_dir out] [--batch_size 100]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def load_stages_from_yaml(path: str):
    """Parse the reference YAML schema (stages.*.scheme/nits/lr/loss_weights
    w_<name>/custom_lrs, plus optional top-level args overrides)."""
    import yaml

    from smilify_tpu.fitter.fitter3d import Stage

    with open(path) as f:
        cfg = yaml.safe_load(f)

    stages = []
    for name, sc in cfg.get("stages", {}).items():
        lw = {
            k[2:]: float(v) for k, v in (sc.get("loss_weights") or {}).items() if k.startswith("w_")
        }
        stages.append(
            Stage(
                name=name,
                scheme=sc.get("scheme", "default"),
                n_its=int(sc.get("nits", 100)),
                lr=float(sc.get("lr", 1e-3)),
                loss_weights=lw or None,
                custom_lrs=sc.get("custom_lrs") or {},
            )
        )
    return stages, cfg.get("args", {}) or {}


def combine_stage_results(results_dir: str, stage_name: str, n_batches: int):
    """Merge per-batch npz files into one (reference optimise.py:77-110)."""
    parts = [
        np.load(os.path.join(results_dir, f"batch_{b}", f"{stage_name}.npz"), allow_pickle=True)
        for b in range(n_batches)
    ]
    merged = {}
    for key in parts[0].files:
        vals = [p[key] for p in parts]
        if key == "faces":
            merged[key] = vals[0]
        elif vals[0].ndim == 0:
            merged[key] = vals[0]
        else:
            merged[key] = np.concatenate(vals, axis=0)
    out = os.path.join(results_dir, f"{stage_name}.npz")
    np.savez(out, **merged)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description="SMIL → target-mesh 3D registration")
    ap.add_argument("--model", required=True)
    ap.add_argument("--mesh_dir", required=True)
    ap.add_argument("--yaml_src", required=True)
    ap.add_argument("--results_dir", default="fit3d_results")
    ap.add_argument("--batch_size", type=int, default=100,
                    help="targets per optimization batch (-1 = all at once)")
    ap.add_argument("--num_samples", type=int, default=3000)
    ap.add_argument("--iter-chunk", type=int, default=10,
                    help="optimization iterations per device dispatch "
                         "(lax.scan chain; 1 = dispatch every iteration)")
    ap.add_argument("--shard", action="store_true",
                    help="shard the scan axis over ALL devices (shard_map; "
                         "each batch is padded to a device-count multiple by "
                         "duplicating scans, duplicates dropped from the npz)")
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() for pod-slice launches; "
                         "with --shard the scan mesh spans every host's devices "
                         "and npz/plot writes are gated to process 0")
    args = ap.parse_args(argv)

    from smilify_tpu.train.multihost import is_primary, maybe_initialize_multihost

    maybe_initialize_multihost(args.multihost)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.fitter.fitter3d import (
        ShardedStageManager,
        StageManager,
        pad_target_meshes,
    )
    from smilify_tpu.utils.export import load_obj

    stages, yaml_args = load_stages_from_yaml(args.yaml_src)
    results_dir = yaml_args.get("results_dir", args.results_dir)
    os.makedirs(results_dir, exist_ok=True)

    spec = load_model_spec(args.model, align_symmetry=False)

    obj_paths = sorted(glob.glob(os.path.join(args.mesh_dir, "*.obj")))
    if not obj_paths:
        raise SystemExit(f"no .obj files in {args.mesh_dir}")
    print(f"{len(obj_paths)} target meshes, {len(stages)} stages")

    bs = args.batch_size if args.batch_size > 0 else len(obj_paths)
    batches = [obj_paths[i : i + bs] for i in range(0, len(obj_paths), bs)]

    final_stage = stages[-1].name if stages else "final"
    for b, batch_paths in enumerate(batches):
        meshes, names = [], []
        for p in batch_paths:
            v, f = load_obj(p)
            meshes.append((v, f))
            names.append(os.path.splitext(os.path.basename(p))[0])
        n_real = len(meshes)
        if args.shard:
            import jax

            n_dev = len(jax.devices())
            while len(meshes) % n_dev:  # pad by cycling; dropped before export
                i = len(meshes) % n_real
                meshes.append(meshes[i])
                names.append(f"_pad_{names[i]}")
        targets = pad_target_meshes(meshes, names)
        mgr = ShardedStageManager(spec, targets) if args.shard else StageManager(spec, targets)
        for st in stages:
            st.num_samples = args.num_samples
            st.loss_history = []
            mgr.add_stage(st)

        def cb(stage_name, it, loss, objs):
            if it % 50 == 0:
                print(f"  [batch {b}] {stage_name} it {it:4d} loss {loss:.5f}")

        mgr.run(callback=cb, chunk=args.iter_chunk)
        # collective: every process gathers the global params to host numpy;
        # only process 0 writes below
        from smilify_tpu.train.multihost import allgather

        mgr.params = allgather(mgr.params)
        if len(meshes) > n_real:  # drop the sharding padding before export
            import jax

            mgr.params = jax.tree.map(lambda x: x[:n_real], mgr.params)
            mgr.targets = targets._replace(
                verts=targets.verts[:n_real], verts_mask=targets.verts_mask[:n_real],
                faces=targets.faces[:n_real], faces_mask=targets.faces_mask[:n_real],
                names=targets.names[:n_real],
            )
        if is_primary():
            out = mgr.save_npz(os.path.join(results_dir, f"batch_{b}"), final_stage)
            mgr.plot_losses(os.path.join(results_dir, f"batch_{b}"))
            mgr.plot_loss_components(os.path.join(results_dir, f"batch_{b}"))
            print(f"batch {b}: saved {out}")

    if len(batches) > 1 and is_primary():
        merged = combine_stage_results(results_dir, final_stage, len(batches))
        print(f"merged → {merged}")


if __name__ == "__main__":
    main()
