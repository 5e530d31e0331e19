"""Qualitative training observability for the neural trainers.

Reference parity (``train_multiview_regressor.py``):
  * per-epoch rendered collages — GT view image + predicted-keypoint overlay
    + hard-Phong render of the predicted body (``:820-1721``);
  * 3D-keypoint scatter plots, predicted vs GT (``visualize_3d_keypoints:1722``);
  * IEF health monitoring — per-iteration delta norms of the transformer
    decoder's running estimates (``:663-670``).

All helpers are host-side (numpy/matplotlib) and consume one already-decoded
prediction batch, so a single eval forward per visualization epoch suffices.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def ief_delta_norms(history: List[Dict]) -> Dict[str, float]:
    """Mean L2 norm of per-iteration IEF estimate deltas, per output group.

    Returns {"<group>_delta_iter<i>": norm}. A healthy IEF head shows
    decreasing deltas across iterations; exploding or flat-zero deltas are the
    failure signatures the reference monitors (``:663-670``)."""
    out: Dict[str, float] = {}
    for i in range(1, len(history)):
        prev, cur = history[i - 1], history[i]
        if isinstance(cur, dict):
            for k in cur:
                d = np.asarray(cur[k]) - np.asarray(prev[k])
                out[f"ief_{k}_delta_iter{i}"] = float(np.sqrt((d ** 2).mean()))
        else:  # flat (B, total) running estimates (transformer_decoder history)
            d = np.asarray(cur) - np.asarray(prev)
            out[f"ief_delta_iter{i}"] = float(np.sqrt((d ** 2).mean()))
    return out


def _body_forward(spec, preds, idx):
    """Posed verts + joints for one decoded sample (host→device round trip)."""
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward

    theta = jnp.concatenate(
        [preds["global_rot"][idx][None, None, :], preds["joint_rot"][idx][None]], axis=1
    )
    log_scales = preds.get("log_beta_scales")
    joint_trans = preds.get("betas_trans")
    out = smil_forward(
        spec,
        preds["betas"][idx][None],
        theta,
        log_scales=None if log_scales is None else log_scales[idx][None],
        joint_trans=None if joint_trans is None else joint_trans[idx][None],
    )
    trans = preds["trans"][idx]
    return out.verts[0] + trans, out.joints[0] + trans


def _quick_pck(spec, preds, batch, image_size, multiview: bool, thr_px: float = 5.0):
    """PCK@5px of predicted joints projected through the predicted cameras on
    the visualization batch — a cheap per-epoch accuracy signal (the full
    benchmark CLI computes the proper dual-resolution PCK curves)."""
    from smilify_tpu.render.cameras import default_camera

    H, W = image_size
    n = int(np.asarray(preds["global_rot"]).shape[0])
    hits, total = 0, 0
    for i in range(n):
        _, joints3d = _body_forward(spec, preds, i)
        if multiview:
            vm = np.asarray(batch["view_mask"][i])
            if not vm.any():
                continue
            v = int(np.nonzero(vm)[0][0])
            cam = default_camera().replace(R=preds["view_cam_rot"][i, v],
                                           T=preds["view_cam_trans"][i, v],
                                           fov=preds["view_fov"][i, v])
            gt_xy = np.asarray(batch["keypoints_2d"][i, v])
            vis = np.asarray(batch["keypoint_visibility"][i, v]) > 0
        else:
            cam = default_camera().replace(R=preds["cam_rot"][i], T=preds["cam_trans"][i],
                                           fov=preds["fov"][i])
            gt_xy = np.asarray(batch["keypoints_2d"][i])
            vis = np.asarray(batch.get("keypoint_visibility",
                                       np.ones(gt_xy.shape[:1]))[i]) > 0
        if not vis.any():
            continue
        if np.nanmax(np.abs(gt_xy)) <= 1.5:
            # normalized (y, x) convention (replicAnt loader) → pixel xy
            gt_xy = np.stack([gt_xy[:, 1] * W, gt_xy[:, 0] * H], axis=-1)
        yx = np.asarray(cam.project_points_yx(joints3d, (H, W)))
        K = min(len(yx), len(gt_xy))
        err = np.linalg.norm(yx[:K, ::-1] - gt_xy[:K], axis=-1)
        hits += int((err[vis[:K]] < thr_px).sum())
        total += int(vis[:K].sum())
    return (hits / total) if total else None


def render_epoch_collages(
    spec,
    preds: Dict,
    batch: Dict[str, np.ndarray],
    image_size,
    out_dir: str,
    epoch: int,
    max_samples: int = 4,
    multiview: bool = True,
) -> List[str]:
    """Write per-sample collage PNGs: GT image + GT/pred keypoint overlay +
    hard-Phong render of the predicted body through the (predicted) camera."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.render.phong import render_phong
    from smilify_tpu.utils.visualization import draw_joints

    H, W = image_size
    os.makedirs(out_dir, exist_ok=True)
    n = min(max_samples, int(np.asarray(preds["global_rot"]).shape[0]))
    paths = []
    for i in range(n):
        verts, joints3d = _body_forward(spec, preds, i)
        if multiview:
            vm = np.asarray(batch["view_mask"][i])
            v = int(np.nonzero(vm)[0][0]) if vm.any() else 0
            img = np.asarray(batch["images"][i, v])
            cam = default_camera().replace(
                R=preds["view_cam_rot"][i, v],
                T=preds["view_cam_trans"][i, v],
                fov=preds["view_fov"][i, v],
            )
            gt_kp_xy = np.asarray(batch["keypoints_2d"][i, v])
            gt_vis = np.asarray(batch["keypoint_visibility"][i, v])
        else:
            img = np.asarray(batch["image"][i])
            cam = default_camera().replace(
                R=preds["cam_rot"][i], T=preds["cam_trans"][i], fov=preds["fov"][i]
            )
            gt_kp_xy = np.asarray(batch["keypoints_2d"][i])
            gt_vis = np.asarray(batch.get("keypoint_visibility",
                                          np.ones(gt_kp_xy.shape[:1]))[i])

        kp_yx = np.asarray(cam.project_points_yx(joints3d, (H, W)))
        pv = cam.world_to_view(verts)
        ndc = jnp.concatenate([cam.view_to_ndc(pv)[:, :2], pv[:, 2:3]], axis=1)
        shaded = np.asarray(render_phong(verts, pv, ndc, spec.faces, (H, W)))

        if gt_kp_xy.size and np.nanmax(np.abs(gt_kp_xy)) <= 1.5:
            # normalized (y, x) convention (multiview stores / sv-from-mv,
            # hdf5_dataset.py) → pixel (y, x); same heuristic as _quick_pck
            gt_yx = gt_kp_xy * np.asarray([H, W], dtype=gt_kp_xy.dtype)
        else:
            gt_yx = gt_kp_xy[:, ::-1]  # stored pixel (x, y) → (y, x)
        gt_panel = draw_joints(img, gt_yx, gt_vis)
        pred_panel = draw_joints(img, kp_yx, np.ones(len(kp_yx)))
        overlay = shaded * 0.6 + img * 0.4
        collage = np.concatenate([gt_panel, pred_panel, overlay, shaded], axis=1)
        path = os.path.join(out_dir, f"epoch{epoch:04d}_sample{i}.png")
        imageio.imwrite(path, (np.clip(collage, 0, 1) * 255).astype(np.uint8))
        paths.append(path)
    return paths


def plot_3d_keypoints(
    pred_joints: np.ndarray,
    gt_joints: Optional[np.ndarray],
    out_path: str,
    title: str = "3D keypoints",
) -> str:
    """Predicted (red) vs GT (green) 3D keypoint scatter
    (reference visualize_3d_keypoints, train_multiview_regressor.py:1722)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(pred_joints)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], c="red", s=12, label="pred")
    if gt_joints is not None:
        g = np.asarray(gt_joints)
        nz = ~np.all(g == 0, axis=-1)
        ax.scatter(g[nz, 0], g[nz, 1], g[nz, 2], c="green", s=12, label="gt")
        for a, b in zip(p[nz], g[nz]):
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], c="gray", lw=0.5)
    ax.set_title(title)
    ax.legend()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def epoch_visualization(
    spec,
    apply_fn,
    params,
    batch_stats,
    batch: Dict,
    image_size,
    out_root: str,
    epoch: int,
    multiview: bool = True,
    max_samples: int = 4,
    viz_dir: str = "visualizations",
) -> Dict[str, float]:
    """One eval forward on a host batch → collages + 3D plot + IEF metrics.

    ``viz_dir`` is the subdirectory of ``out_root`` to write into — trainers
    pass ``cfg.output.train_visualizations_dir`` (reference keeps train-time
    collages separate from inference visualizations).

    Returns the IEF delta-norm metrics so the trainer can log them into its
    history (plotted by plot_training_history alongside the losses)."""
    import jax

    preds, _ = apply_fn({"params": params, "batch_stats": batch_stats}, batch, False)
    preds = jax.device_get(preds)
    metrics = ief_delta_norms(preds.get("ief_history") or [])
    pck = _quick_pck(spec, preds, batch, image_size, multiview=multiview)
    if pck is not None:
        metrics["ief_val_pck5"] = pck  # logged + plotted with the IEF curves

    out_dir = os.path.join(out_root, viz_dir)
    render_epoch_collages(
        spec, preds, batch, image_size, out_dir, epoch,
        max_samples=max_samples, multiview=multiview,
    )
    _, joints3d = _body_forward(spec, preds, 0)
    gt = batch.get("keypoints_3d")
    plot_3d_keypoints(
        np.asarray(joints3d),
        None if gt is None else np.asarray(gt[0]),
        os.path.join(out_dir, f"epoch{epoch:04d}_kp3d.png"),
        title=f"epoch {epoch}",
    )
    return metrics
