"""Render a fitted parameter sequence to video.

Equivalent of the reference ``smal_fitter/generate_video.py``: loads the
per-frame parameter pkls written by the fitter's ImageExporter
(checkpoints/<name>/<frame>/st{S}_ep{E}.pkl), re-poses the model, renders
Phong frames, and assembles an MP4 (and optionally re-exports the collage
sequence as video).

Usage:
  python -m smilify_tpu.cli.generate_video --checkpoint-dir checkpoints/run \
      --model <pkl> --epoch-name st10_ep0 --output out.mp4 [--fps 15]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Render fitted sequences to video")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--epoch-name", default="st10_ep0",
                    help="which stage/epoch files to use (reference EPOCH_NAME)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("--collage", action="store_true",
                    help="assemble the exported collage pngs instead of re-rendering")
    args = ap.parse_args(argv)

    import imageio.v2 as imageio

    out_path = args.output or os.path.join(args.checkpoint_dir, f"{args.epoch_name}.mp4")

    frame_dirs = sorted(
        d for d in glob.glob(os.path.join(args.checkpoint_dir, "*")) if os.path.isdir(d)
    )
    if not frame_dirs:
        raise SystemExit(f"no frame directories in {args.checkpoint_dir}")

    if args.collage:
        frames = []
        for d in frame_dirs:
            png = os.path.join(d, f"{args.epoch_name}.png")
            if os.path.exists(png):
                frames.append(imageio.imread(png))
        if not frames:
            raise SystemExit(f"no {args.epoch_name}.png files found")
        from smilify_tpu.utils.export import write_video

        write_video(out_path, frames, fps=args.fps)
        print(f"video ({len(frames)} collage frames) → {out_path}")
        return out_path

    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.render.phong import render_phong

    spec = load_model_spec(args.model, align_symmetry=False)
    H = W = args.size
    frames = []
    for d in frame_dirs:
        pkl_path = os.path.join(d, f"{args.epoch_name}.pkl")
        if not os.path.exists(pkl_path):
            continue
        with open(pkl_path, "rb") as f:
            p = pickle.load(f)
        theta = np.concatenate(
            [p["global_rotation"][None], p["joint_rotations"].reshape(-1, 3)], axis=0
        )
        log_scales = p.get("log_betascale")
        joint_trans = p.get("betas_trans")
        out = smil_forward(
            spec,
            jnp.asarray(p["betas"][None]),
            jnp.asarray(theta[None]),
            log_scales=jnp.asarray(log_scales[None]) if log_scales is not None and log_scales.ndim == 2 else None,
            joint_trans=jnp.asarray(joint_trans[None]) if joint_trans is not None and joint_trans.ndim == 2 else None,
        )
        verts = out.verts[0] + jnp.asarray(p["trans"])
        cam = default_camera().replace(fov=jnp.asarray(float(np.atleast_1d(p.get("fov", 60.0))[0])))
        pts_view = cam.world_to_view(verts)
        ndc = cam.view_to_ndc(pts_view)
        verts_ndc = jnp.concatenate([ndc[:, :2], pts_view[:, 2:3]], axis=1)
        img = np.asarray(render_phong(verts, pts_view, verts_ndc, spec.faces, (H, W)))
        frames.append((img * 255).astype(np.uint8))

    if not frames:
        raise SystemExit(f"no {args.epoch_name}.pkl files found")
    from smilify_tpu.utils.export import write_video

    write_video(out_path, frames, fps=args.fps)
    print(f"video ({len(frames)} rendered frames) → {out_path}")
    return out_path


if __name__ == "__main__":
    main()
