"""Unit tests for smaller modules: COCO RLE decode, rotations round-trips,
combined dataset mixing, monitoring, crop_to_silhouette."""

import numpy as np
import jax.numpy as jnp


def test_coco_rle_roundtrip():
    """Encode a mask to COCO compressed RLE and decode it back."""
    from smilify_tpu.data.loaders import _decode_coco_rle

    rng = np.random.RandomState(0)
    h, w = 12, 9
    mask = (rng.rand(h, w) > 0.6).astype(np.uint8)

    # build COCO RLE: column-major runs, then LEB128-ish string encoding
    flat = mask.T.reshape(-1)
    runs = []
    val = 0
    count = 0
    for px in flat:
        if px == val:
            count += 1
        else:
            runs.append(count)
            val = 1 - val
            count = 1
    runs.append(count)

    # uncompressed list form
    out = _decode_coco_rle(list(runs), h, w)
    np.testing.assert_array_equal(out, mask)

    # compressed string form (coco's encoding)
    s = []
    for i, x in enumerate(runs):
        if i > 2:
            x -= runs[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = x != -1 if (c & 0x10) else x != 0
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    out2 = _decode_coco_rle("".join(s), h, w)
    np.testing.assert_array_equal(out2, mask)


def test_rotation_6d_roundtrips():
    from smilify_tpu.core.rotations import (
        axis_angle_to_rotation_6d,
        matrix_to_rotation_6d,
        rotation_6d_to_axis_angle,
        rotation_6d_to_matrix,
    )

    rng = np.random.RandomState(1)
    aa = jnp.asarray(rng.randn(20, 3) * 0.8, dtype=jnp.float32)
    rec = rotation_6d_to_axis_angle(axis_angle_to_rotation_6d(aa))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(aa), atol=1e-5)

    d6 = axis_angle_to_rotation_6d(aa)
    R = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(matrix_to_rotation_6d(R)), np.asarray(d6), atol=1e-5)
    # orthonormality
    RtR = np.einsum("nij,nkj->nik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)


def test_combined_dataset_mixing():
    from smilify_tpu.data.combined import CombinedDataset

    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"x": np.asarray([i]), "tag": self.tag}

    ds = CombinedDataset([
        {"dataset": Fake(10, "a"), "weight": 3.0, "name": "a",
         "available_labels": {"pose": False}},
        {"dataset": Fake(30, "b"), "weight": 1.0, "name": "b"},
    ])
    assert len(ds) == 40
    s = ds[5]
    assert s["dataset_name"] == "a" and s["availability"]["pose"] is False
    s = ds[15]
    assert s["dataset_name"] == "b" and s["availability"]["pose"] is True

    w = ds.sampling_weights()
    # dataset a carries 3/4 of the probability mass over 10 samples
    np.testing.assert_allclose(w[:10].sum(), 0.75, atol=1e-9)
    rng = np.random.default_rng(0)
    idx = ds.sample_indices(4000, rng)
    frac_a = (idx < 10).mean()
    assert 0.7 < frac_a < 0.8


def test_performance_monitor():
    import time

    from smilify_tpu.utils.monitoring import MemoryMonitor, PerformanceMonitor

    pm = PerformanceMonitor()
    with pm.section("work"):
        time.sleep(0.01)
    with pm.section("work"):
        time.sleep(0.01)
    rep = pm.report()
    assert "work" in rep and "host RSS" in rep
    assert pm.counts["work"] == 2

    mm = MemoryMonitor()
    mm.snapshot("t0")
    assert mm.peak_host_mb() > 10


def test_crop_to_silhouette():
    from smilify_tpu.data.loaders import crop_to_silhouette

    sil = np.zeros((100, 80))
    sil[30:60, 20:50] = 1.0
    rgb = np.random.RandomState(0).rand(100, 80, 3)
    joints = np.array([[45.0, 35.0]])  # (y, x) at the blob center
    sil_c, rgb_c, j_c = crop_to_silhouette(sil, rgb, joints, 64)
    assert sil_c.shape == (64, 64) and rgb_c.shape == (64, 64, 3)
    # blob center lands near the crop center
    np.testing.assert_allclose(j_c[0], [32, 32], atol=4)
    assert sil_c.mean() > 0.5  # the blob fills most of the 1.05x crop


def test_rotation_aware_smoothing():
    """Naive axis-angle averaging breaks near the ±π boundary; the
    rotation-space smoother must stay on the geodesic (reference
    run_multiview_inference.py:71-120)."""
    import numpy as np
    from scipy.spatial.transform import Rotation

    from smilify_tpu.utils.animation_export import PredictionSmoother

    sm = PredictionSmoother(3)
    # trajectory crossing the axis-angle discontinuity: rotations about z by
    # angles near π with alternating sign representation
    angles = np.array([np.pi - 0.1, -(np.pi - 0.05), np.pi - 0.1])
    aa = np.stack([np.array([0.0, 0.0, a]) for a in angles])
    out = sm.smooth_rotations(aa)
    # all inputs are ~π about z; the smoothed middle must stay near π, not
    # collapse toward 0 like the naive vector mean ((π−0.1 − π+0.05 + π−0.1)/3 ≈ π/3)
    mid = Rotation.from_rotvec(out[1]).magnitude()
    assert abs(mid - np.pi) < 0.15, mid
    naive = np.linalg.norm(aa.mean(axis=0))
    assert abs(naive - np.pi) > 1.0  # the naive mean really is wrong

    # matrix smoothing stays on SO(3)
    mats = Rotation.from_rotvec(aa).as_matrix()
    sm_m = sm.smooth_params({"cam_rot": mats})["cam_rot"]
    for m in sm_m:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(m) > 0.99

    # batched per-joint shape support
    aa_joints = np.tile(aa[:, None, :], (1, 4, 1))
    out_j = sm.smooth_rotations(aa_joints)
    assert out_j.shape == (3, 4, 3)


def test_mesh_plot_suite_and_scene_debug(tmp_path, stick_spec):
    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.utils.visualization import (
        plot_mesh,
        plot_mesh_heatmap,
        plot_pointclouds,
        render_scene_debug,
    )

    spec = stick_spec
    out = smil_forward(spec, jnp.zeros((1, spec.n_betas)), jnp.zeros((1, spec.n_joints, 3)))
    v = np.asarray(out.verts[0])
    f = np.asarray(spec.faces)

    import os
    p1 = plot_mesh(v, f, str(tmp_path / "mesh.png"))
    p2 = plot_pointclouds([v[::10], v[::7] + 0.01], str(tmp_path / "pc.png"), ["a", "b"])
    p3 = plot_mesh_heatmap(v, f, np.random.RandomState(0).rand(len(f)),
                           str(tmp_path / "heat.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 1000

    img = render_scene_debug(spec, default_camera(), out.verts[0],
                             keypoints_3d=out.joints[0], image_size=(64, 64))
    assert img.shape == (64, 64, 3)
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-6
