"""Synthetic multi-view dataset generation from the SMIL model itself.

Renders ground-truth poses of a ModelSpec through a ring of OpenCV-convention
cameras and writes the standard multi-view HDF5 — the fully-synthetic analogue
of the reference's replicAnt pipeline, used for end-to-end training tests and
the 18-cam mouse / 4-cam stick benchmark configurations (BASELINE.json) when
the original capture data is unavailable.

Because the images are rendered from the *same* ModelSpec that training and
benchmarking use, ground truth is exactly reachable: there is no asset-mismatch
keypoint floor (cf. BENCHMARK.md's 21.3 px floor on the bundled replicAnt
capture), which makes this the right substrate for held-out generalization
proofs.

Generation is chunk-batched: one jitted ``smil_forward`` over sample chunks and
one batched rasterizer call per (camera, chunk) — the rasterizer takes frame
batches as a native grid axis — so thousand-sample datasets are minutes, not
hours, on the tunneled single-chip setup.
"""

from __future__ import annotations


import numpy as np


def ring_cameras_opencv(n_views: int, radius: float = 2.5, height: float = 0.8,
                        focal: float = 300.0, resolution: int = 224):
    """OpenCV-convention (R, t, K) ring looking at the origin."""
    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        C = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ C
        K = np.array([
            [focal, 0, (resolution - 1) / 2.0],
            [0, focal, (resolution - 1) / 2.0],
            [0, 0, 1.0],
        ])
        cams.append((R, t, K))
    return cams


def generate_synthetic_multiview(
    spec,
    out_path: str,
    n_samples: int = 8,
    n_views: int = 4,
    resolution: int = 96,
    pose_scale: float = 0.1,
    beta_scale: float = 0.3,
    seed: int = 0,
    render_images: bool = True,
    chunk_size: int = 32,
    keyframe_every: int = 0,
):
    """Sample random SMIL configurations, project through a camera ring, render
    silhouette-shaded images, and write the multi-view HDF5.

    Parameter draws are per-sample in a fixed order, so a given ``seed``
    produces the same ground-truth parameters regardless of ``chunk_size``.

    ``keyframe_every > 0`` turns the i.i.d. draws into a SMOOTH temporal
    sequence: every ``keyframe_every``-th sample's draw becomes a keyframe and
    the frames between are cosine-interpolated (pose/shape), producing a
    video-like clip for inference/render demos while keeping the same
    parameter distribution at the keyframes.
    """
    import jax
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.data.hdf5_dataset import write_multiview_hdf5
    from smilify_tpu.render.cameras import camera_from_opencv
    from smilify_tpu.render.rasterizer import soft_silhouette

    rng = np.random.RandomState(seed)
    cams = ring_cameras_opencv(n_views, resolution=resolution)
    P = spec.n_joints - 1

    # ---- per-sample parameter draws (order is the determinism contract)
    betas_all = np.empty((n_samples, spec.n_betas), np.float32)
    grot_all = np.empty((n_samples, 3), np.float32)
    jrot_all = np.empty((n_samples, P, 3), np.float32)
    for s in range(n_samples):
        betas_all[s] = rng.randn(spec.n_betas).astype(np.float32) * beta_scale
        grot_all[s] = rng.randn(3).astype(np.float32) * 0.3
        jrot_all[s] = rng.randn(P, 3).astype(np.float32) * pose_scale
    trans_all = np.zeros((n_samples, 3), np.float32)
    if keyframe_every > 0:
        kf = np.arange(0, n_samples, keyframe_every)
        if kf[-1] != n_samples - 1:
            kf = np.append(kf, n_samples - 1)
        t = np.arange(n_samples, dtype=np.float64)
        seg = np.clip(np.searchsorted(kf, t, side="right") - 1, 0, len(kf) - 2)
        f = (t - kf[seg]) / np.maximum(kf[seg + 1] - kf[seg], 1)
        w = (0.5 - 0.5 * np.cos(np.pi * f)).astype(np.float32)  # cosine ease
        for arr in (betas_all, grot_all, jrot_all):
            a, b = arr[kf[seg]], arr[kf[seg + 1]]
            arr[:] = a + (b - a) * w.reshape((-1,) + (1,) * (arr.ndim - 1))
    theta_all = np.concatenate([grot_all[:, None], jrot_all], axis=1)  # (N, J, 3)

    # ---- chunk-batched forward + render (one compiled shape via padding)
    C = min(chunk_size, n_samples)
    n_chunks = -(-n_samples // C)
    n_pad = n_chunks * C

    fwd = jax.jit(lambda b, t: (lambda o: (o.verts, o.joints))(smil_forward(spec, b, t)))

    def pad(a):
        return np.concatenate([a, np.repeat(a[-1:], n_pad - n_samples, axis=0)], 0) \
            if n_pad != n_samples else a

    betas_p, theta_p = pad(betas_all), pad(theta_all)
    V = spec.v_template.shape[0]
    verts_np = np.empty((n_samples, V, 3), np.float32)
    joints_np = np.empty((n_samples, spec.n_joints, 3), np.float32)
    for c in range(n_chunks):
        lo, hi = c * C, (c + 1) * C
        v, j = fwd(jnp.asarray(betas_p[lo:hi]), jnp.asarray(theta_p[lo:hi]))
        keep = min(hi, n_samples) - lo
        verts_np[lo:lo + keep] = np.asarray(v)[:keep]
        joints_np[lo:lo + keep] = np.asarray(j)[:keep]

    images_all = None
    if render_images:
        @jax.jit
        def render_chunk(verts, R, t, K):
            cam = camera_from_opencv(R, t, K, (resolution, resolution))
            pv = cam.world_to_view(verts)                     # (C, V, 3)
            ndc = cam.view_to_ndc(pv)
            verts_ndc = jnp.concatenate([ndc[..., :2], pv[..., 2:3]], axis=-1)
            return soft_silhouette(verts_ndc, spec.faces, (resolution, resolution),
                                   znear=1e-3, use_pallas=None)

        verts_p = pad(verts_np)
        images_all = np.empty((n_samples, n_views, resolution, resolution, 3), np.uint8)
        for vi, (R, t, K) in enumerate(cams):
            Rj = jnp.asarray(R, jnp.float32)
            tj = jnp.asarray(t, jnp.float32)
            Kj = jnp.asarray(K, jnp.float32)
            for c in range(n_chunks):
                lo, hi = c * C, (c + 1) * C
                alpha = np.asarray(render_chunk(jnp.asarray(verts_p[lo:hi]), Rj, tj, Kj))
                keep = min(hi, n_samples) - lo
                img = np.stack([alpha[:keep] * 0.2, alpha[:keep] * 0.7,
                                alpha[:keep] * 0.9], axis=-1)
                images_all[lo:lo + keep, vi] = (img * 255).astype(np.uint8)

    # ---- host-side vectorized keypoint projection
    samples = []
    kp2d_v, kpv_v = [], []
    for (R, t, K) in cams:
        pc = joints_np @ R.T + t                              # (N, J, 3)
        uv = pc[..., :2] / np.maximum(pc[..., 2:3], 1e-9) * np.diag(K)[:2] + K[:2, 2]
        inb = (
            (uv[..., 0] >= 0) & (uv[..., 0] < resolution)
            & (uv[..., 1] >= 0) & (uv[..., 1] < resolution)
            & (pc[..., 2] > 0)
        )
        kp2d_v.append(uv.astype(np.float32))
        kpv_v.append(inb.astype(np.float32))
    kp2d_all = np.stack(kp2d_v, axis=1)                       # (N, views, J, 2)
    kpv_all = np.stack(kpv_v, axis=1)
    Ks = np.stack([K for (_, _, K) in cams]).astype(np.float32)
    Rs = np.stack([R for (R, _, _) in cams]).astype(np.float32)
    ts = np.stack([t for (_, t, _) in cams]).astype(np.float32)
    sizes = np.full((n_views, 2), resolution, np.int32)

    for s_idx in range(n_samples):
        if images_all is not None:
            imgs = list(images_all[s_idx])
        else:
            imgs = [np.zeros((resolution, resolution, 3), np.uint8)] * n_views
        samples.append({
            "images": imgs,
            "camera_indices": list(range(n_views)),
            "keypoints_2d": kp2d_all[s_idx],
            "keypoint_visibility": kpv_all[s_idx],
            "camera_intrinsics": Ks,
            "camera_extrinsics_R": Rs,
            "camera_extrinsics_t": ts,
            "image_sizes": sizes,
            "keypoints_3d": joints_np[s_idx],
            "global_rot": grot_all[s_idx],
            "joint_rot": jrot_all[s_idx],
            "betas": betas_all[s_idx],
            "trans": trans_all[s_idx],
            "session_name": "synthetic",
            "frame_idx": s_idx,
        })

    write_multiview_hdf5(
        out_path, samples, max_views=n_views, target_resolution=resolution,
        canonical_camera_order=[f"cam_{i}" for i in range(n_views)],
        n_pose=P, n_betas=spec.n_betas, dataset_type="synthetic_multiview",
    )
    return out_path
