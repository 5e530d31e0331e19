"""Depth-buffer self-occlusion visibility refinement
(reference Unreal2Pytorch3D.py:664 — VERDICT round-1 gap #4)."""

import os
import shutil

import numpy as np

from smilify_tpu.data.replicant import refine_visibility_with_depth

TEX = "/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX"


def test_refinement_semantics():
    H = W = 10
    depth = np.zeros((H, W, 4), np.uint8)
    depth[..., 0] = 26  # surface ≈ (26/255)*1000 ≈ 102 cm everywhere
    cam = np.zeros(3)
    kp = np.array([
        [0.5, 0.5],   # occluded: joint at 300 cm behind a 102 cm surface
        [0.5, 0.5],   # visible: joint at 80 cm, in front of the surface
        [0.5, 0.5],   # within tolerance: 104 cm vs 102+5
        [1.5, 0.5],   # out of frame → skipped
        [0.5, 0.5],   # NaN 3D → skipped
        [0.5, 0.5],   # already invisible → stays 0
    ])
    p3 = np.array([
        [300.0, 0, 0],
        [80.0, 0, 0],
        [104.0, 0, 0],
        [300.0, 0, 0],
        [np.nan, np.nan, np.nan],
        [300.0, 0, 0],
    ])
    vis = np.array([1, 1, 1, 1, 1, 0], np.float32)
    out = refine_visibility_with_depth(vis, kp, p3, cam, depth, W, H)
    np.testing.assert_array_equal(out, [0, 1, 1, 1, 1, 0])


def test_neighborhood_min():
    """The surface lookup takes the min over the neighborhood window — a
    nearer surface one pixel away still occludes."""
    H = W = 9
    depth = np.full((H, W, 4), 255, np.uint8)   # far surface everywhere...
    depth[4, 5, 0] = 10                          # ...except one near pixel
    out = refine_visibility_with_depth(
        np.ones(1, np.float32), np.array([[4.4 / H, 4.4 / W]]),
        np.array([[500.0, 0, 0]]), np.zeros(3), depth, W, H, neighborhood=1,
    )
    assert out[0] == 0.0
    # neighborhood=0 samples only the exact pixel (far) → stays visible
    out0 = refine_visibility_with_depth(
        np.ones(1, np.float32), np.array([[4.4 / H, 4.4 / W]]),
        np.array([[500.0, 0, 0]]), np.zeros(3), depth, W, H, neighborhood=0,
    )
    assert out0[0] == 1.0


def test_loader_consumes_depth_pass(tmp_path, stick_spec):
    """A depth PNG beside the frame flips self-occluded joints invisible."""
    import imageio.v2 as imageio

    from smilify_tpu.data.replicant import load_smil_unreal_sample

    d = tmp_path / "replicAnt-x-SMIL-TEX"
    d.mkdir()
    for fn in ("replicAnt-x-SMIL-TEX_00.JPG", "replicAnt-x-SMIL-TEX_00.json",
               "_BatchData_replicAnt-x-SMIL-TEX.json"):
        shutil.copy(os.path.join(TEX, fn), d / fn)
    jp = str(d / "replicAnt-x-SMIL-TEX_00.json")

    _, y_plain = load_smil_unreal_sample(jp, stick_spec.joint_names, load_image=False)
    base_vis = y_plain["keypoint_visibility"].copy()
    assert base_vis.sum() > 0

    img = imageio.imread(str(d / "replicAnt-x-SMIL-TEX_00.JPG"))
    H, W = img.shape[:2]

    # all-far surface (R=255 → 1000 cm): nothing becomes occluded
    far = np.zeros((H, W, 4), np.uint8)
    far[..., 0] = 255
    imageio.imwrite(str(d / "replicAnt-x-SMIL-TEX_00_D.png"), far)
    _, y_far = load_smil_unreal_sample(jp, stick_spec.joint_names, load_image=False)
    np.testing.assert_array_equal(y_far["keypoint_visibility"], base_vis)

    # all-near surface (R=0 → 0 cm): every visible joint is behind it
    imageio.imwrite(str(d / "replicAnt-x-SMIL-TEX_00_D.png"),
                    np.zeros((H, W, 4), np.uint8))
    _, y_near = load_smil_unreal_sample(jp, stick_spec.joint_names, load_image=False)
    assert y_near["keypoint_visibility"].sum() == 0
