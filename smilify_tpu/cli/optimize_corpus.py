"""Corpus fitting CLI — batched optimization over MANY independent clips.

The reference fitter (``smal_fitter/optimize_to_joints.py:66-195``) processes
one sequence per process; fitting a corpus of clips means re-running the
script per clip, paying the startup + per-dispatch cost every time and leaving
the accelerator mostly idle on small frames. This CLI stacks S clips on a
leading sequence axis and runs the whole staged schedule as ONE jitted
optimization (:class:`smilify_tpu.fitter.fitter_batch.BatchedFitter`): the
rasterizer and SMIL forward see a flat (S*N) frame batch, and the result is
exactly S independent fits (tests/test_fitter_batch.py) at batched throughput.

Usage:
  python -m smilify_tpu.cli.optimize_corpus \
      --model 3D_model_prep/SMILy_STICK.pkl \
      --data-root data/replicAnt_trials/SMIL_COCO \
      --sequences replicAnt:SMIL_00_synth.jpg replicAnt:SMIL_01_synth.jpg \
      [--all-replicant] [--crop-size 256 --use-crop] [--test]

Every clip must load to the same (frames, H, W) shape — use ``--use-crop`` to
square-crop to ``--crop-size`` (replicAnt frames are otherwise native size,
which is also uniform per trial folder) and ``--max-frames`` to truncate
video sequences to a common length.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _load_clip(seq: str, args, spec):
    from smilify_tpu.data.loaders import (
        load_badja_sequence,
        load_smil_sequence,
        load_stanford_sequence,
    )

    dataset, name = seq.split(":")
    if dataset == "replicAnt":
        arrays, filenames = load_smil_sequence(
            args.data_root, name, args.crop_size,
            joint_names=spec.joint_names,
            ignore_joints=[spec.joint_names[i] for i in spec.ignore_joints],
            use_crop=args.use_crop,
        )
    elif dataset == "badja":
        arrays, filenames = load_badja_sequence(
            args.data_root, name, args.crop_size,
            annotated_classes=list(range(spec.n_joints)),
        )
    elif dataset == "stanfordextra":
        arrays, filenames = load_stanford_sequence(args.data_root, name, args.crop_size)
    else:
        raise SystemExit(f"unknown dataset {dataset}")
    rgb, sil, joints, vis = arrays
    if args.max_frames and rgb.shape[0] > args.max_frames:
        rgb, sil, joints, vis = (a[: args.max_frames] for a in (rgb, sil, joints, vis))
        filenames = filenames[: args.max_frames]
    return (rgb, sil, joints, vis), filenames, os.path.splitext(os.path.basename(name))[0]


def main(argv=None):
    ap = argparse.ArgumentParser(description="batched SMIL corpus fitter")
    ap.add_argument("--model", required=True, help="model .pkl file")
    ap.add_argument("--sequences", nargs="+", default=None,
                    help="dataset:name entries (all must share frame count and size)")
    ap.add_argument("--all-replicant", action="store_true",
                    help="fit every image in <data-root>/labels.json as a 1-frame clip")
    ap.add_argument("--data-root", default="data/replicAnt_trials/SMIL_COCO")
    ap.add_argument("--crop-size", type=int, default=512)
    ap.add_argument("--use-crop", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None,
                    help="truncate every clip to N frames (videos of unequal length)")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--vis-frequency", type=int, default=50)
    ap.add_argument("--test", action="store_true", help="10-iteration test schedule")
    ap.add_argument("--test-stages", type=int, default=None)
    ap.add_argument("--limb-scaling", action=argparse.BooleanOptionalAction, default=True,
                    help="optimize per-joint limb scales (--no-limb-scaling freezes them)")
    ap.add_argument("--unity-prior", default=None, metavar="NPZ")
    ap.add_argument("--walking-prior", default=None, metavar="PKL")
    ap.add_argument("--approx-max-faces", default="auto",
                    help="work-list raster per-tile z-nearest face cap: "
                         "'auto' (default) = IoU-gated resolution-scaled cap "
                         "on TPU, exact off-TPU; integer pins; --exact opts out")
    ap.add_argument("--exact", action="store_true",
                    help="exact all-faces SoftRas (disable the auto work-list cap)")
    ap.add_argument("--iter-chunk", type=int, default=10,
                    help="optimization iterations per device dispatch "
                         "(lax.scan chain; 1 = dispatch every iteration)")
    ap.add_argument("--shard", action="store_true",
                    help="shard the clip axis over ALL devices "
                         "(shard_map; corpus is padded by repeating clips to a "
                         "multiple of the device count, padding discarded on export)")
    ap.add_argument("--shard-grid", default=None, metavar="CxF",
                    help="2-D ('clips','frames') mesh, e.g. 4x2: clips AND "
                         "frames partitioned at once (long-clip corpora); "
                         "frame count must divide F")
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() for pod-slice launches; "
                         "with --shard/--shard-grid the mesh spans every "
                         "host's devices and exports are gated to process 0")
    args = ap.parse_args(argv)

    from smilify_tpu.train.multihost import is_primary, maybe_initialize_multihost

    maybe_initialize_multihost(args.multihost)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.fitter.fitter import FitData, render_frame
    from smilify_tpu.fitter.fitter_batch import BatchedFitter
    from smilify_tpu.fitter.stages import OPT_WEIGHTS, test_schedule
    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.utils.export import ImageExporter
    from smilify_tpu.utils.visualization import fit_collage

    spec = load_model_spec(args.model, align_symmetry=False)
    out_dir = args.output_dir or os.path.join("checkpoints", time.strftime("%Y%m%d-%H%M%S"))

    sequences = list(args.sequences or [])
    if args.all_replicant:
        with open(os.path.join(args.data_root, "labels.json")) as f:
            meta = json.load(f)
        sequences += [f"replicAnt:{e['file_name']}" for e in meta["images"]]
    if len(sequences) < 1:
        raise SystemExit("no sequences: pass --sequences and/or --all-replicant")

    clips, clip_names, clip_filenames = [], [], []
    for seq in sequences:
        arrays, filenames, clip_name = _load_clip(seq, args, spec)
        clips.append(arrays)
        clip_names.append(clip_name)
        clip_filenames.append(filenames)

    shapes = {c[1].shape for c in clips}
    if len(shapes) != 1:
        detail = ", ".join(f"{n}: {c[1].shape}" for n, c in zip(clip_names, clips))
        raise SystemExit(
            f"clips disagree on (frames, H, W) — {detail}; use --use-crop/"
            f"--crop-size and --max-frames to make them uniform"
        )

    n_real = len(clips)
    grid = None
    if args.shard_grid:
        dc, df = (int(v) for v in args.shard_grid.lower().split("x"))
        grid = (dc, df)
    if args.shard or grid:
        pad_to = grid[0] if grid else len(jax.devices())
        while len(clips) % pad_to:  # pad by cycling; padded fits are discarded
            i = len(clips) % n_real
            clips.append(clips[i])
            clip_names.append(f"_pad_{clip_names[i]}")
            clip_filenames.append(clip_filenames[i])
    S = len(clips)
    N, H, W = clips[0][1].shape
    print(f"Corpus: {S} clips x {N} frames  image {H}x{W}  model J={spec.n_joints}")

    rgb = np.stack([c[0] for c in clips])
    sil = np.stack([c[1] for c in clips])
    joints = np.stack([c[2] for c in clips])
    vis = np.stack([c[3] for c in clips])
    data = FitData(
        rgb=rgb,
        sil=jnp.asarray(sil),
        joints=jnp.asarray(joints),
        visibility=jnp.asarray(vis),
    )

    pose_prior = shape_prior = None
    if args.walking_prior:
        from smilify_tpu.fitter.priors import walking_pose_prior

        pose_prior = walking_pose_prior(args.walking_prior)
    if args.unity_prior:
        from smilify_tpu.fitter.priors import unity_shape_prior

        shape_prior = unity_shape_prior(args.unity_prior, n_betas=spec.n_betas)

    fitter_cls = BatchedFitter
    fit_kwargs = {}
    if grid:
        from jax.sharding import Mesh

        from smilify_tpu.fitter.fitter_batch import GridShardedFitter

        dc, df = grid
        fitter_cls = GridShardedFitter
        fit_kwargs["mesh"] = Mesh(
            np.asarray(jax.devices()[: dc * df]).reshape(dc, df), ("clips", "frames")
        )
        print(f"sharding {S} clips ({n_real} real) × {N} frames over a {dc}x{df} mesh")
    elif args.shard:
        from smilify_tpu.fitter.fitter_batch import ShardedBatchedFitter

        fitter_cls = ShardedBatchedFitter
        print(f"sharding {S} clips ({n_real} real) over {len(jax.devices())} devices")
    from smilify_tpu.cli.optimize_to_joints import resolve_approx_max_faces
    from smilify_tpu.render.rasterizer import auto_approx_max_faces

    approx = resolve_approx_max_faces(args, (H, W), auto_approx_max_faces)
    fitter = fitter_cls(spec, data, (H, W), allow_limb_scaling=args.limb_scaling,
                        pose_prior=pose_prior, shape_prior=shape_prior,
                        approx_max_faces=approx, **fit_kwargs)

    # one exporter over the flattened corpus (padding clips excluded):
    # out_dir/<clip>/<frame>/st_ep.* (single-frame clips skip the clip level —
    # same layout as optimize_to_joints: out_dir/<frame>/st_ep.*)
    flat_names = [
        clip_filenames[s][i] if N == 1 else os.path.join(clip_names[s], clip_filenames[s][i])
        for s in range(n_real)
        for i in range(N)
    ]
    exporter = ImageExporter(out_dir, flat_names)
    schedule = test_schedule(max_stages=args.test_stages) if args.test else OPT_WEIGHTS

    def visualize(stage_id, epoch):
        # the allgather is a collective — EVERY process joins; only process 0
        # renders and writes (multi-host params are not host-addressable)
        from smilify_tpu.train.multihost import allgather

        params_h = jax.tree.map(jnp.asarray, allgather(fitter.params))
        if not is_primary():
            return
        prev_params = fitter.params
        fitter.params = params_h
        try:
            _visualize_primary(stage_id, epoch)
        finally:
            fitter.params = prev_params

    def _visualize_primary(stage_id, epoch):
        verts, joints3d = fitter.forward_frames()  # (S, N, V, 3), (S, N, J, 3)
        exporter.stage_id = stage_id
        exporter.epoch_name = str(epoch)
        for s in range(n_real):
            p = fitter.sequence_params(s)
            for i in range(N):
                cam = default_camera().replace(fov=p.fov[i])
                sil_r, kp_yx = render_frame(spec, cam, verts[s, i], joints3d[s, i], (H, W))
                collage = fit_collage(
                    rgb[s, i],
                    np.repeat(np.asarray(sil_r)[..., None], 3, axis=-1),
                    sil[s, i],
                    np.asarray(sil_r),
                    joints[s, i],
                    np.asarray(kp_yx),
                    vis[s, i],
                )
                params_np = {
                    "global_rotation": np.asarray(p.global_rot[i]),
                    "joint_rotations": np.asarray(p.joint_rot[i]),
                    "betas": np.asarray(p.betas),
                    "trans": np.asarray(p.trans[i]),
                    "fov": np.asarray(p.fov[i]),
                    "log_betascale": np.asarray(p.log_beta_scales),
                    "betas_trans": np.asarray(p.joint_trans),
                }
                exporter.export((collage * 255.0), s * N + i, params_np,
                                np.asarray(verts[s, i]), np.asarray(spec.faces))

    t_start = time.time()

    def cb(stage, it, loss, objs):
        if it % args.vis_frequency == 0:
            print(f"stage {stage} it {it:4d} loss {float(loss):.4f} "
                  + " ".join(f"{k}={float(v):.3f}" for k, v in objs.items() if float(v) != 0))
            visualize(stage, it)

    fitter.fit(schedule, callback=cb, chunk=args.iter_chunk)
    visualize(10, 0)  # final export, reference convention stage_id=10
    elapsed = time.time() - t_start
    total_iters = sum(s.num_iters for s in schedule)
    print(f"done: {S} clips in {elapsed:.1f}s "
          f"({S * N * total_iters / elapsed:.1f} frame-iters/s) → {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
