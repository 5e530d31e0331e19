"""Neural inference CLI (single- and multi-view).

Equivalent of the reference ``run_singleview_inference.py`` /
``run_multiview_inference.py``: load a checkpoint (+ its embedded config),
run batched predictions over a dataset or image folder, optionally smooth the
parameter trajectory temporally, render overlay visualizations / per-view
grids, export video and AMASS animation.

The reference's 2-phase DDP pipeline (frame-sharded inference → pickled temp
predictions → rank-0 smoothing → re-sharded rendering,
run_multiview_inference.py:664-930) collapses to one process: frames are
batched through jit on the mesh, smoothing is a host-side array op.

Usage:
  python -m smilify_tpu.cli.run_inference --checkpoint runs/sv/final_model \
      --data-path <dir|h5> [--smooth-window 5] [--export-animation out.npz] \
      [--render-dir out_frames] [--video out.mp4]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def discover_checkpoint(path: str) -> str:
    """Resolve a run directory to its best checkpoint: ``best_model`` first,
    then ``final_model``, then the newest ``epoch_N`` — searching both the run
    root and a ``checkpoints/`` subdir (reference auto-discovery,
    run_multiview_inference.py:66,298-305). A path that is already a
    checkpoint (has a sibling ``.meta.json``) is returned unchanged."""
    if os.path.exists(path + ".meta.json"):
        return path
    if not os.path.isdir(path):
        return path
    for root in (path, os.path.join(path, "checkpoints")):
        if not os.path.isdir(root):
            continue
        for name in ("best_model", "final_model"):
            cand = os.path.join(root, name)
            if os.path.exists(cand + ".meta.json"):
                print(f"auto-discovered checkpoint: {cand}")
                return cand
        epochs = sorted(
            (int(n.split("_")[1]), n) for n in os.listdir(root)
            if n.startswith("epoch_") and n.split("_")[1].isdigit()
            and os.path.exists(os.path.join(root, n + ".meta.json"))
        )
        if epochs:
            cand = os.path.join(root, epochs[-1][1])
            print(f"auto-discovered checkpoint: {cand}")
            return cand
    return path


def load_model_from_checkpoint(ckpt_path: str):
    """Rebuild model+params from a checkpoint directory (config embedded in
    the .meta.json — the reference's checkpoint['config'] contract). A run
    directory is resolved via ``discover_checkpoint`` (best_model first)."""
    import jax
    import jax.numpy as jnp

    from smilify_tpu.train.config import config_from_dict, resolve_model_spec
    ckpt_path = discover_checkpoint(ckpt_path)
    meta_path = ckpt_path + ".meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    cfg = config_from_dict(meta["config"])
    spec = resolve_model_spec(cfg)
    rcfg = cfg.regressor_config(spec)

    if cfg.mode == "multi_view":
        from smilify_tpu.models.multiview import MultiViewSMILRegressor

        model = MultiViewSMILRegressor(rcfg)
        res = cfg.model.input_resolution or 224
        V = rcfg.max_views
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, V, res, res, 3)),
            jnp.ones((1, V), bool),
            jnp.zeros((1, V), jnp.int32),
        )
    else:
        from smilify_tpu.models.regressor import SMILRegressor

        model = SMILRegressor(rcfg)
        res = cfg.model.input_resolution or 224
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)))

    abstract = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": None,
    }
    # restore only params/batch_stats (opt_state shape depends on the optimizer)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_path))
    params = restored["params"]
    batch_stats = restored.get("batch_stats", {})
    return model, cfg, rcfg, spec, params, batch_stats, meta


def main(argv=None):
    ap = argparse.ArgumentParser(description="SMIL neural inference")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--smooth-window", type=int, default=0)
    ap.add_argument("--export-animation", default=None)
    ap.add_argument("--render-dir", default=None)
    ap.add_argument("--video", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--crop-mode", choices=["default", "centred", "bbox_crop"],
                    default="default", help="raw-video input crop mode")
    ap.add_argument("--sleap-predictions", default=None,
                    help=".slp/.h5 predictions for bbox_crop + keypoint overlays")
    ap.add_argument("--joint-lookup", default=None, help="sleap→model joint CSV")
    ap.add_argument("--shard", action="store_true",
                    help="shard inference batches over all local devices "
                         "(the reference's 2-phase frame-sharded DDP pipeline, "
                         "run_multiview_inference.py:664-930, as one sharded jit)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.models.regressor import decode_predictions, forward_model
    from smilify_tpu.utils.animation_export import AnimationRecorder, PredictionSmoother

    model, cfg, rcfg, spec, params, batch_stats, meta = load_model_from_checkpoint(args.checkpoint)
    res = cfg.model.input_resolution or 224

    from smilify_tpu.data.video import VideoFrameDataset

    if args.data_path.lower().endswith(VideoFrameDataset.VIDEO_EXTS):
        # raw-video input with SLEAP-bbox crop modes
        # (reference run_singleview_inference.py centred/default/bbox_crop)
        from smilify_tpu.data.sleap_raw import read_joint_lookup_csv

        dataset = VideoFrameDataset(
            args.data_path, resolution=res, crop_mode=args.crop_mode,
            sleap_predictions=args.sleap_predictions,
            joint_names=list(spec.joint_names),
            joint_lookup=read_joint_lookup_csv(args.joint_lookup) if args.joint_lookup else None,
            max_frames=args.max_frames,
        )
        kind = "raw_video"
    else:
        from smilify_tpu.cli.train_regressor import build_dataset

        cfg.dataset.data_path = args.data_path
        dataset, kind = build_dataset(cfg, spec)
    n = len(dataset) if args.max_frames is None else min(len(dataset), args.max_frames)
    print(f"inference over {n} frames ({kind})")

    is_mv = cfg.mode == "multi_view"

    mesh, n_dev = None, 1
    if args.shard:
        from smilify_tpu.train.trainer import data_mesh, replicate

        mesh = data_mesh()
        n_dev = mesh.devices.size
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
        print(f"sharding inference batches over {n_dev} device(s)")

    @jax.jit
    def predict(batch_imgs, view_mask=None, cam_ids=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if is_mv:
            (raw, _), _ = model.apply(variables, batch_imgs, view_mask, cam_ids,
                                      train=False, mutable=["batch_stats"])
            from smilify_tpu.models.multiview import decode_multiview_predictions

            return decode_multiview_predictions(rcfg, raw, spec)
        (raw, _), _ = model.apply(variables, batch_imgs, train=False, mutable=["batch_stats"])
        return decode_predictions(rcfg, raw, spec)

    from smilify_tpu.train.trainer import StagingCollator

    all_preds = []
    bs = args.batch_size
    # persistent staging buffers: long video runs would otherwise pay the
    # tunneled-TPU per-batch alloc/free pinning penalty (see StagingCollator)
    staging = StagingCollator()
    keys = ("images", "view_mask", "camera_indices") if is_mv else ("image",)
    for i in range(0, n, bs):
        idxs = list(range(i, min(n, i + bs)))
        n_real = len(idxs)
        if n_dev > 1:
            # pad the ragged final batch so the leading axis stays divisible
            # by the mesh (static shapes under jit); padded rows are trimmed
            # from the predictions below
            idxs += [idxs[-1]] * ((-n_real) % n_dev)
        samples = [dataset[j] for j in idxs]
        batch = staging([{k: s[k] for k in keys} for s in samples])
        if mesh is not None:
            from smilify_tpu.train.trainer import shard_batch

            batch_dev = shard_batch(mesh, batch)
            staging.guard(batch, batch_dev)
            batch = batch_dev
        if is_mv:
            preds = predict(batch["images"], batch["view_mask"],
                            batch["camera_indices"])
        else:
            preds = predict(batch["image"])
        all_preds.append({k: np.asarray(v)[:n_real] for k, v in preds.items()})

    traj = {k: np.concatenate([p[k] for p in all_preds]) for k in all_preds[0]}

    if args.smooth_window and args.smooth_window > 1:
        smoother = PredictionSmoother(args.smooth_window)
        # rotations smooth in rotation space; cameras (fov/R/t) smooth too
        # (reference PredictionSmoother covers camera params as well)
        smooth_keys = [k for k in ("global_rot", "joint_rot", "trans", "betas",
                                   "fov", "cam_rot", "cam_trans",
                                   "view_fov", "view_cam_rot", "view_cam_trans")
                       if k in traj]
        traj = smoother.smooth_params(traj, smooth_keys)
        print(f"smoothed {smooth_keys} with window {args.smooth_window}")

    if args.export_animation:
        rec = AnimationRecorder(model_name=os.path.basename(spec.source_path))
        for i in range(n):
            rec.add_frame(
                traj["global_rot"][i], traj["joint_rot"][i], traj["trans"][i],
                betas=traj["betas"][i],
                log_beta_scales=traj.get("log_beta_scales", [None] * n)[i],
                betas_trans=traj.get("betas_trans", [None] * n)[i],
            )
        path = rec.export(args.export_animation)
        print(f"animation → {path}")

    if args.render_dir or args.video:
        from smilify_tpu.render.cameras import default_camera
        from smilify_tpu.render.phong import render_phong
        from smilify_tpu.utils.visualization import draw_joints

        # default render location: cfg.output.visualizations_dir next to the
        # checkpoint (reference inference writes into the run's viz dir)
        render_dir = args.render_dir or os.path.join(
            os.path.dirname(discover_checkpoint(args.checkpoint)) or ".",
            cfg.output.visualizations_dir,
        )
        os.makedirs(render_dir, exist_ok=True)
        import imageio.v2 as imageio

        preds_j = {k: jnp.asarray(v) for k, v in traj.items()}
        verts, joints3d = forward_model(spec, preds_j,
                                        use_ue_scaling=rcfg.use_ue_scaling)

        # All views (mv) / a chunk of frames (sv) render in ONE jitted call
        # that converts to uint8 ON DEVICE: the tunneled transport moves
        # ~10 MB/s, so shipping f32 pixels one view at a time caps export at
        # a few fps regardless of render speed — one uint8 batch per frame
        # is 4x fewer bytes and V(x C) fewer round trips.
        def render_one(vtx, j3d, R, T, fov):
            cam = default_camera().replace(R=R, T=T, fov=fov)
            pts_view = cam.world_to_view(vtx)
            ndc = cam.view_to_ndc(pts_view)
            verts_ndc = jnp.concatenate([ndc[:, :2], pts_view[:, 2:3]], axis=1)
            img = render_phong(vtx, pts_view, verts_ndc, spec.faces, (res, res))
            kp = cam.project_points_yx(j3d, (res, res))
            return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8), kp

        frames = []
        if is_mv:
            # per-view videos + a multi-view grid video
            # (reference run_multiview_inference.py:833-914 output contract)
            V = preds_j["view_fov"].shape[1]

            @jax.jit
            def render_frame_views(i):
                # lax.map (not vmap) over views: rasterization intermediates
                # are (H, W, face_chunk)-sized, so a vmapped views axis
                # multiplies peak HBM by V — at 18 cameras (mouse config) and
                # res 224 that OOMs the chip. Sequential views keep the
                # footprint V-independent; the outputs are tiny (u8 pixels).
                def one_view(cam_args):
                    R, T, fov = cam_args
                    return render_one(verts[i], joints3d[i], R, T, fov)

                return jax.lax.map(
                    one_view,
                    (preds_j["view_cam_rot"][i], preds_j["view_cam_trans"][i],
                     preds_j["view_fov"][i]))

            per_view_frames = [[] for _ in range(V)]
            for i in range(n):
                imgs_u8, kps = render_frame_views(i)
                imgs_u8 = np.asarray(imgs_u8)  # one (V,res,res,3) u8 fetch
                kps = np.asarray(kps)
                row = []
                for v in range(V):
                    u8 = draw_joints(imgs_u8[v], kps[v])
                    per_view_frames[v].append(u8)
                    row.append(u8)
                # grid: views tiled in rows of ≤4
                cols = min(4, V)
                rows_n = -(-V // cols)
                pad = rows_n * cols - V
                row += [np.zeros_like(row[0])] * pad
                grid = np.concatenate(
                    [np.concatenate(row[r * cols:(r + 1) * cols], axis=1)
                     for r in range(rows_n)], axis=0)
                frames.append(grid)
                imageio.imwrite(os.path.join(render_dir, f"frame_{i:05d}.png"), grid)
            if args.video:
                from smilify_tpu.utils.export import write_video

                base, ext = os.path.splitext(args.video)
                for v in range(V):
                    write_video(f"{base}_view{v}{ext}", per_view_frames[v], fps=15)
                print(f"per-view videos → {base}_view*.{ext.lstrip('.')}")
        else:
            C = max(1, min(8, n))  # frames per device round trip

            @jax.jit
            def render_frame_chunk(lo):
                idx = jnp.minimum(lo + jnp.arange(C), n - 1)  # clamped tail
                return jax.vmap(render_one)(
                    verts[idx], joints3d[idx], preds_j["cam_rot"][idx],
                    preds_j["cam_trans"][idx], preds_j["fov"][idx])

            for lo in range(0, n, C):
                imgs_u8, kps = render_frame_chunk(lo)
                imgs_u8 = np.asarray(imgs_u8)  # one (C,res,res,3) u8 fetch
                kps = np.asarray(kps)
                for j in range(min(C, n - lo)):
                    frames.append(draw_joints(imgs_u8[j], kps[j]))
                    imageio.imwrite(
                        os.path.join(render_dir, f"frame_{lo + j:05d}.png"),
                        frames[-1])
        if args.video:
            from smilify_tpu.utils.export import write_video

            write_video(args.video, frames, fps=15)
            print(f"video → {args.video}")

    out_npz = os.path.join(os.path.dirname(args.checkpoint) or ".", "predictions.npz")
    np.savez(out_npz, **traj)
    print(f"predictions → {out_npz}")
    return traj


if __name__ == "__main__":
    main()
