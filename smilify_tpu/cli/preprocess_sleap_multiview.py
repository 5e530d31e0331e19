"""SLEAP multi-camera session → multi-view HDF5 preprocessor CLI.

Equivalent of the reference
``python -m smal_fitter.sleap_data.preprocess_sleap_multiview_dataset``:
discovers per-camera prediction files + videos in session directories, loads
the anipose calibration, synchronizes frames, undistorts, crops (default /
centred / bbox_crop) with intrinsics adjustment, optionally attaches
triangulated 3D keypoints (points3d.h5), and writes the shared multi-view
HDF5 schema with a canonical camera order across sessions.

Usage:
  python -m smilify_tpu.cli.preprocess_sleap_multiview \
      --sessions <dir> [<dir> ...] --calibration calibration.toml \
      --output out.h5 [--resolution 224] [--crop-mode bbox_crop] \
      [--frame-skip 1] [--max-frames N] [--workers N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def collect_session_frames(session_dir, cams, crop_args, max_frames=None, frame_skip=1):
    """One session directory → list of synchronized frame dicts."""
    from smilify_tpu.data.sleap_raw import find_session_layout, read_sleap_predictions, read_video_frame

    layout = find_session_layout(session_dir)
    cam_names = [c.name for c in cams]
    per_cam = {}
    n_frames = None
    for cam in cam_names:
        entry = layout.get(cam)
        if entry is None or "predictions" not in entry:
            continue
        pts, scores, nodes = read_sleap_predictions(entry["predictions"])
        per_cam[cam] = {"points": pts, "scores": scores, "video": entry.get("video")}
        n_frames = pts.shape[0] if n_frames is None else min(n_frames, pts.shape[0])
    if not per_cam or n_frames is None:
        return []
    if max_frames:
        n_frames = min(n_frames, max_frames * frame_skip)

    cal = {c.name: c for c in cams}
    frames = []
    for f_idx in range(0, n_frames, frame_skip):
        frame = {"frame_idx": f_idx, "session_name": os.path.basename(session_dir)}
        for cam, d in per_cam.items():
            img = read_video_frame(d["video"], f_idx) if d["video"] else None
            if img is None:
                continue  # per-camera resilience: missing video frame → view dropped
            c = cal[cam]
            frame[cam] = {
                "image": img,
                "keypoints_xy": d["points"][f_idx],
                "scores": d["scores"][f_idx],
                "K": c.matrix,
                "dist": c.distortions,
                "R": c.R,
                "t": c.translation,
            }
        frames.append(frame)
    return frames


def main(argv=None):
    ap = argparse.ArgumentParser(description="SLEAP multi-view sessions → HDF5")
    ap.add_argument("--sessions", nargs="+", required=True)
    ap.add_argument("--calibration", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", default=None, help="model pkl (records n_pose/n_betas)")
    ap.add_argument("--resolution", type=int, default=224)
    ap.add_argument("--crop-mode", default="default", choices=["default", "centred", "bbox_crop"])
    ap.add_argument("--no-undistort", action="store_true")
    ap.add_argument("--min-views", type=int, default=2)
    ap.add_argument("--frame-skip", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--points3d", default=None, help="points3d.h5 with triangulated keypoints")
    args = ap.parse_args(argv)

    from smilify_tpu.data.hdf5_dataset import write_multiview_hdf5
    from smilify_tpu.data.preprocess_multiview import preprocess_session_frames
    from smilify_tpu.data.sleap import load_calibration_toml, read_points3d_h5

    cams = load_calibration_toml(args.calibration)
    canonical = sorted(c.name for c in cams)  # canonical camera order across sessions
    print(f"{len(cams)} cameras: {canonical}")

    n_pose, n_betas = 0, 0
    if args.model:
        from smilify_tpu.core.spec import load_model_spec

        spec = load_model_spec(args.model, align_symmetry=False)
        n_pose, n_betas = spec.n_joints - 1, spec.n_betas

    points3d = read_points3d_h5(args.points3d) if args.points3d else None

    all_samples = []
    for sess in args.sessions:
        frames = collect_session_frames(sess, cams, args, args.max_frames, args.frame_skip)
        if points3d is not None:
            for fr in frames:
                fi = fr["frame_idx"]
                if fi < len(points3d):
                    fr["keypoints_3d"] = np.nan_to_num(points3d[fi])
        samples = preprocess_session_frames(
            frames, canonical, args.resolution, args.crop_mode,
            undistort=not args.no_undistort, min_views_per_sample=args.min_views,
        )
        print(f"{sess}: {len(frames)} frames → {len(samples)} samples")
        all_samples.extend(samples)

    if not all_samples:
        raise SystemExit("no samples produced")
    K = all_samples[0]["keypoints_2d"].shape[1]
    write_multiview_hdf5(
        args.output, all_samples, max_views=len(cams), target_resolution=args.resolution,
        canonical_camera_order=canonical, n_pose=n_pose or K - 1, n_betas=n_betas or 0,
        dataset_type="sleap_multiview",
        extra_metadata={"crop_mode": args.crop_mode, "undistort_images": not args.no_undistort},
    )
    print(f"wrote {len(all_samples)} samples → {args.output}")


if __name__ == "__main__":
    main()
