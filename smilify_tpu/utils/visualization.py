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
    """Draw star markers at (row, col) joints on a (H, W, 3) float [0,1] image."""
    import cv2

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
    return img.astype(np.float32) / 255.0


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
