"""Synthetic multi-view dataset generation from the SMIL model itself.

Renders ground-truth poses of a ModelSpec through a ring of OpenCV-convention
cameras and writes the standard multi-view HDF5 — the fully-synthetic analogue
of the reference's replicAnt pipeline, used for end-to-end training tests and
the 18-cam mouse / 4-cam stick benchmark configurations (BASELINE.json) when
the original capture data is unavailable.
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
):
    """Sample random SMIL configurations, project through a camera ring, render
    silhouette-shaded images, and write the multi-view HDF5."""
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.data.hdf5_dataset import write_multiview_hdf5
    from smilify_tpu.render.cameras import camera_from_opencv
    from smilify_tpu.render.rasterizer import soft_silhouette

    rng = np.random.RandomState(seed)
    cams = ring_cameras_opencv(n_views, resolution=resolution)
    K_joints = spec.n_joints
    P = spec.n_joints - 1

    samples = []
    for s_idx in range(n_samples):
        betas = rng.randn(spec.n_betas).astype(np.float32) * beta_scale
        global_rot = rng.randn(3).astype(np.float32) * 0.3
        joint_rot = rng.randn(P, 3).astype(np.float32) * pose_scale
        trans = np.zeros(3, np.float32)

        theta = np.concatenate([global_rot[None], joint_rot], axis=0)
        out = smil_forward(spec, jnp.asarray(betas[None]), jnp.asarray(theta[None]))
        verts = np.asarray(out.verts[0])
        joints = np.asarray(out.joints[0])

        images, kp2d, kpv, Ks, Rs, ts, sizes = [], [], [], [], [], [], []
        for (R, t, K) in cams:
            pc = joints @ R.T + t
            uv = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-9) * np.diag(K)[:2] + K[:2, 2]
            inb = (
                (uv[:, 0] >= 0) & (uv[:, 0] < resolution)
                & (uv[:, 1] >= 0) & (uv[:, 1] < resolution)
                & (pc[:, 2] > 0)
            )
            kp2d.append(uv.astype(np.float32))
            kpv.append(inb.astype(np.float32))
            Ks.append(K)
            Rs.append(R)
            ts.append(t)
            sizes.append([resolution, resolution])
            if render_images:
                cam = camera_from_opencv(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
                                         jnp.asarray(K, jnp.float32), (resolution, resolution))
                pts_view = cam.world_to_view(jnp.asarray(verts))
                ndc = cam.view_to_ndc(pts_view)
                verts_ndc = jnp.concatenate([ndc[:, :2], pts_view[:, 2:3]], axis=1)
                alpha = np.asarray(
                    soft_silhouette(verts_ndc, spec.faces, (resolution, resolution),
                                    znear=1e-3, use_pallas=None)
                )
                img = np.stack([alpha * 0.2, alpha * 0.7, alpha * 0.9], axis=-1)
                images.append((img * 255).astype(np.uint8))
            else:
                images.append(np.zeros((resolution, resolution, 3), np.uint8))

        samples.append({
            "images": images,
            "camera_indices": list(range(n_views)),
            "keypoints_2d": np.stack(kp2d),
            "keypoint_visibility": np.stack(kpv),
            "camera_intrinsics": np.stack(Ks).astype(np.float32),
            "camera_extrinsics_R": np.stack(Rs).astype(np.float32),
            "camera_extrinsics_t": np.stack(ts).astype(np.float32),
            "image_sizes": np.asarray(sizes, np.int32),
            "keypoints_3d": joints.astype(np.float32),
            "global_rot": global_rot,
            "joint_rot": joint_rot,
            "betas": betas,
            "trans": trans,
            "session_name": "synthetic",
            "frame_idx": s_idx,
        })

    write_multiview_hdf5(
        out_path, samples, max_views=n_views, target_resolution=resolution,
        canonical_camera_order=[f"cam_{i}" for i in range(n_views)],
        n_pose=P, n_betas=spec.n_betas, dataset_type="synthetic_multiview",
    )
    return out_path
