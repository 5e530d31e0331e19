"""Visualization: joint-marker overlays and fitting collages.

Equivalent of the reference's ``SMALJointDrawer`` (cv2 markers with rainbow
colors, smal_fitter/draw_smal_joints.py) and the 5-panel fitter collage
(fitter.py:480-503: targets / render / overlay / silhouette-error / rotated view).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def rainbow_colors(n: int):
    """Reference config.py:125-128 marker colors."""
    return [
        (int(255 - i * 255 / n), int(i * 255 / n), 100) for i in range(n)
    ]


def draw_joints(
    image: np.ndarray,
    joints_yx: np.ndarray,
    visible: Optional[np.ndarray] = None,
    marker_size: int = 6,
) -> np.ndarray:
    """Draw star markers at (row, col) joints on a (H, W, 3) image.

    Accepts float [0,1] (returns float) or uint8 (returns uint8 — the
    render-export hot path ships uint8 straight from the device, see
    cli/run_inference.py)."""
    import cv2

    was_u8 = image.dtype == np.uint8
    if was_u8:
        img = np.ascontiguousarray(image).copy()
    else:
        img = (np.ascontiguousarray(image) * 255.0).astype(np.uint8)
    H, W = img.shape[:2]
    n = len(joints_yx)
    colors = rainbow_colors(n)
    for k, (y, x) in enumerate(np.asarray(joints_yx)):
        if visible is not None and not bool(visible[k]):
            continue
        if not (0 <= y < H and 0 <= x < W):
            continue
        cv2.drawMarker(
            img, (int(x), int(y)), colors[k], markerType=cv2.MARKER_STAR,
            markerSize=marker_size, thickness=1,
        )
    return img if was_u8 else img.astype(np.float32) / 255.0


def fit_collage(
    rgb: np.ndarray,
    rendered: np.ndarray,
    sil_target: np.ndarray,
    sil_rendered: np.ndarray,
    target_joints_yx: np.ndarray,
    rendered_joints_yx: np.ndarray,
    visibility: Optional[np.ndarray] = None,
    rev_rendered: Optional[np.ndarray] = None,
) -> np.ndarray:
    """5-panel collage row: target+joints | render+joints | overlay | sil error | rotated."""
    target_vis = draw_joints(rgb, target_joints_yx, visibility)
    rendered_vis = draw_joints(rendered, rendered_joints_yx, visibility)
    overlay = draw_joints(rendered * 0.5 + rgb * 0.5, rendered_joints_yx, visibility)
    sil_err = 1.0 - np.abs(sil_target - sil_rendered)
    sil_err_rgb = np.repeat(sil_err[..., None], 3, axis=-1)
    panels = [target_vis, rendered_vis, overlay, sil_err_rgb]
    if rev_rendered is not None:
        panels.append(rev_rendered)
    return np.concatenate(panels, axis=1)


def silhouette_iou(a, b, threshold: float = 0.5) -> float:
    """IoU between two silhouettes (soft maps thresholded) — the parity metric
    named in BASELINE.json."""
    import numpy as np

    A = np.asarray(a) > threshold
    B = np.asarray(b) > threshold
    inter = np.logical_and(A, B).sum()
    union = np.logical_or(A, B).sum()
    return float(inter) / float(union) if union else 1.0


def pck(pred_yx, gt_yx, visibility, threshold_px: float) -> float:
    """Percentage of correct keypoints at a pixel threshold."""
    import numpy as np

    err = np.linalg.norm(np.asarray(pred_yx) - np.asarray(gt_yx), axis=-1)
    vis = np.asarray(visibility) > 0
    if not vis.any():
        return 0.0
    return float((err[vis] <= threshold_px).mean())


# ---------------------------------------------------------------------------
# fitter_3d plot suite (reference fitter_3d/utils.py:102-135) + sphere-scene
# debug renderer (reference Unreal2Pytorch3D.py:1771-1874)
# ---------------------------------------------------------------------------


def plot_mesh(verts, faces, out_path: str, title: str = "", color="lightblue",
              elev: float = 20.0, azim: float = -60.0):
    """Matplotlib trisurf plot of a mesh (reference plot_mesh)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    v = np.asarray(verts)
    f = np.asarray(faces)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot_trisurf(v[:, 0], v[:, 1], v[:, 2], triangles=f, color=color,
                    edgecolor="none", alpha=0.9)
    ax.view_init(elev=elev, azim=azim)
    ax.set_title(title)
    _equal_3d_axes(ax, v)
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def plot_pointclouds(clouds, out_path: str, labels=None, title: str = ""):
    """Overlayed 3D scatter of point clouds (reference plot_pointcloud)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    allpts = []
    for i, c in enumerate(clouds):
        c = np.asarray(c)
        allpts.append(c)
        ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=4,
                   label=(labels[i] if labels else f"cloud {i}"))
    ax.legend()
    ax.set_title(title)
    _equal_3d_axes(ax, np.concatenate(allpts))
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def plot_mesh_heatmap(verts, faces, face_values, out_path: str, title: str = "",
                      cmap: str = "viridis"):
    """Per-face scalar heatmap on the mesh (reference thinness/error plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    v = np.asarray(verts)
    f = np.asarray(faces)
    vals = np.asarray(face_values, np.float64)
    rng = vals.max() - vals.min()
    norm = (vals - vals.min()) / (rng if rng > 0 else 1.0)
    colors = cm.get_cmap(cmap)(norm)

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.add_collection3d(Poly3DCollection(v[f], facecolors=colors, edgecolor="none"))
    ax.set_title(title)
    _equal_3d_axes(ax, v)
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def _equal_3d_axes(ax, pts):
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    c = (lo + hi) / 2
    r = float((hi - lo).max() / 2) or 1.0
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)


def render_scene_debug(spec, camera, verts, keypoints_3d=None, image_size=(256, 256),
                       sphere_px: int = 4):
    """Sphere-scene debug render: Phong mesh + keypoint markers through the
    SAME camera (reference scene renderer, Unreal2Pytorch3D.py:1771-1874 —
    used to validate camera geometry against dataset keypoints).

    Returns an (H, W, 3) float image."""
    import jax.numpy as jnp

    from smilify_tpu.render.phong import render_phong

    H, W = image_size
    pv = camera.world_to_view(jnp.asarray(verts))
    ndc = jnp.concatenate([camera.view_to_ndc(pv)[:, :2], pv[:, 2:3]], axis=1)
    img = np.asarray(render_phong(jnp.asarray(verts), pv, ndc, spec.faces, (H, W)))
    if keypoints_3d is not None:
        yx = np.asarray(camera.project_points_yx(jnp.asarray(keypoints_3d), (H, W)))
        img = draw_joints(img, yx, np.ones(len(yx)), marker_size=sphere_px)
    return img
