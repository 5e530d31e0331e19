"""Point-cloud → SMIL parameter regression (PointNet / PointNet++).

TPU-first equivalent of the reference ``fitter_3d/pointcloud2smil``
(smil_pointnet.py, pointnet2_utils.py): networks that regress SMIL pose/shape
parameters directly from sampled point clouds, trained **self-supervised** on
randomly sampled SMIL configurations (sample_smil_model.py:328) with
chamfer + joint-position losses (smil_pointnet.py:805) and a curriculum over
parameter scales (:737).

PointNet: per-point MLP → max pool → FC head.
PointNet++ (SSG/MSG): farthest-point sampling + radius grouping set-abstraction
layers. FPS/grouping are O(N²) distance computations — MXU-friendly matmuls —
with static group sizes (mask-padded) instead of dynamic neighborhoods.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from smilify_tpu.core.spec import ModelSpec

HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# sampling / grouping primitives
# ---------------------------------------------------------------------------


def farthest_point_sampling(pts: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """(N, 3) → (n_samples,) int32 indices; deterministic start at point 0.

    lax.scan over iterations; each step is a full-cloud distance update
    (vectorized, no data-dependent shapes)."""
    N = pts.shape[0]

    def step(carry, _):
        min_d, last = carry
        d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        return (min_d, nxt), nxt

    init = (jnp.full((N,), jnp.inf, pts.dtype), jnp.asarray(0, jnp.int32))
    _, idx = jax.lax.scan(step, init, None, length=n_samples - 1)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), idx])


def radius_group(pts: jnp.ndarray, centers: jnp.ndarray, radius: float, k: int):
    """Group up to k points within radius of each center (mask-padded).

    Returns (grouped (C, k, 3) relative coords, mask (C, k))."""
    d2 = (
        jnp.sum(centers**2, -1, keepdims=True)
        + jnp.sum(pts**2, -1)[None, :]
        - 2 * jnp.matmul(centers, pts.T, precision=HIGHEST)
    )  # (C, N)
    within = d2 <= radius * radius
    # top-k nearest (ascending); masked beyond radius
    neg_top, idx = jax.lax.top_k(-jnp.where(within, d2, jnp.inf), k)
    mask = jnp.isfinite(-neg_top)
    idx = jnp.where(mask, idx, 0)
    grouped = pts[idx] - centers[:, None, :]
    return grouped, mask.astype(pts.dtype)


# ---------------------------------------------------------------------------
# networks
# ---------------------------------------------------------------------------


class PointNetEncoder(nn.Module):
    """Classic PointNet: shared per-point MLP + global max pool."""

    widths: Sequence[int] = (64, 128, 1024)

    @nn.compact
    def __call__(self, pts: jnp.ndarray) -> jnp.ndarray:  # (N, 3) → (D,)
        x = pts
        for w in self.widths:
            x = nn.Dense(w)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return jnp.max(x, axis=0)


class SetAbstraction(nn.Module):
    """PointNet++ set-abstraction: FPS centers + (multi-scale) radius groups."""

    n_centers: int
    radii: Sequence[float]
    group_k: int
    widths: Sequence[int]

    @nn.compact
    def __call__(self, pts: jnp.ndarray, feats: jnp.ndarray | None = None):
        cidx = farthest_point_sampling(pts, self.n_centers)
        centers = pts[cidx]
        outs = []
        for radius in self.radii:
            grouped, mask = radius_group(pts, centers, radius, self.group_k)  # (C, k, 3)
            x = grouped
            if feats is not None:
                idx_feats = feats[
                    jnp.argsort(
                        jnp.sum((pts[None] - centers[:, None]) ** 2, -1), axis=1
                    )[:, : self.group_k]
                ]
                x = jnp.concatenate([x, idx_feats], axis=-1)
            for w in self.widths:
                x = nn.Dense(w)(x)
                x = nn.LayerNorm()(x)
                x = nn.relu(x)
            x = jnp.max(jnp.where(mask[..., None] > 0, x, -jnp.inf), axis=1)
            x = jnp.where(jnp.isfinite(x), x, 0.0)
            outs.append(x)
        return centers, jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass(frozen=True)
class PointNetConfig:
    arch: str = "pointnet"      # 'pointnet' | 'pointnet2'
    n_pose: int = 54
    n_betas: int = 5
    n_joints: int = 55
    predict_scales: bool = True
    head_hidden: int = 512

    def group_dims(self):
        groups = [
            ("global_rot", 6),
            ("joint_rot", self.n_pose * 6),
            ("betas", self.n_betas),
            ("trans", 3),
        ]
        if self.predict_scales:
            groups += [("scale_weights", self.n_betas), ("trans_weights", self.n_betas)]
        return tuple(groups)


class SMILPointNet(nn.Module):
    """Point cloud (B, N, 3) → SMIL parameter groups (reference SMILPointNet:199 /
    SMILPointNet2:346 depending on config.arch)."""

    config: PointNetConfig

    @nn.compact
    def __call__(self, clouds: jnp.ndarray):
        cfg = self.config
        if clouds.ndim == 2:
            clouds = clouds[None]

        class _Encoder(nn.Module):
            arch: str

            @nn.compact
            def __call__(self, pts):
                if self.arch == "pointnet2":
                    c1, f1 = SetAbstraction(256, (0.1, 0.2), 16, (64, 64, 128), name="sa1")(pts)
                    c2, f2 = SetAbstraction(64, (0.2, 0.4), 16, (128, 128, 256), name="sa2")(c1, f1)
                    x = jnp.concatenate([f2, c2], axis=-1)
                    x = nn.Dense(512, name="sa_out")(x)
                    return jnp.max(x, axis=0)
                return PointNetEncoder(name="encoder")(pts)

        # nn.vmap shares the encoder parameters across the batch dimension
        BatchedEncoder = nn.vmap(
            _Encoder,
            in_axes=0, out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        feats = BatchedEncoder(cfg.arch, name="encoder_batched")(clouds)

        x = feats
        for _ in range(2):
            x = nn.Dense(cfg.head_hidden)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)

        from smilify_tpu.models.transformer_decoder import identity_init_for_group

        out = {}
        for name, d in cfg.group_dims():
            bias = identity_init_for_group(name, d, cfg.n_pose)
            out[name] = nn.Dense(
                d, kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32, b=bias: jnp.asarray(b, dtype),
                name=f"head_{name}",
            )(x)
        return out


# ---------------------------------------------------------------------------
# self-supervised data + losses (reference SMILDataset:495 / train_model:1073)
# ---------------------------------------------------------------------------


def sample_smil_configs(spec: ModelSpec, n: int, key: jax.Array,
                        pose_scale: float = 0.1, beta_scale: float = 0.5,
                        scale_weight_scale: float = 0.0):
    """Random SMIL parameter draws for self-supervised training; the curriculum
    grows these scales over epochs (reference smil_pointnet.py:737)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    P = spec.n_joints - 1
    params = {
        "global_rot": jax.random.normal(k1, (n, 3)) * 0.3,
        "joint_rot": jax.random.normal(k2, (n, P, 3)) * pose_scale,
        "betas": jax.random.normal(k3, (n, spec.n_betas)) * beta_scale,
        "trans": jnp.zeros((n, 3)),
    }
    if scale_weight_scale > 0 and spec.scaledirs is not None:
        params["scale_weights"] = jax.random.normal(k4, (n, spec.n_betas)) * scale_weight_scale
    return params


def clouds_from_params(spec: ModelSpec, params: Dict[str, jnp.ndarray], n_points: int,
                       key: jax.Array):
    """SMIL forward + surface sampling → training point clouds (+GT joints)."""
    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.ops.mesh_ops import sample_points_from_meshes

    n = params["global_rot"].shape[0]
    theta = jnp.concatenate([params["global_rot"][:, None, :], params["joint_rot"]], axis=1)
    log_scales = None
    if "scale_weights" in params and spec.scaledirs is not None:
        log_scales = jnp.einsum("nb,bjc->njc", params["scale_weights"], spec.scaledirs,
                                precision=HIGHEST)
    out = smil_forward(spec, params["betas"], theta, trans=params["trans"],
                       log_scales=log_scales)
    keys = jax.random.split(key, n)
    clouds = jax.vmap(lambda v, k: sample_points_from_meshes(v, spec.faces, n_points, k))(
        out.verts, keys
    )
    return clouds, out.joints


def pointnet_loss(spec: ModelSpec, cfg: PointNetConfig, raw: Dict[str, jnp.ndarray],
                  gt_params: Dict[str, jnp.ndarray], gt_joints: jnp.ndarray,
                  clouds: jnp.ndarray, chamfer_points: int = 512,
                  key: jax.Array | None = None,
                  weights: Dict[str, float] | None = None):
    """Param MSE + joint-position + chamfer losses (smil_pointnet.py:805)."""
    from smilify_tpu.core.rotations import axis_angle_to_rotation_6d
    from smilify_tpu.models.regressor import RegressorConfig, decode_predictions
    from smilify_tpu.ops.knn import knn_points

    w = dict({"param": 1.0, "joint": 1.0, "chamfer": 0.5}, **(weights or {}))
    rcfg_like = RegressorConfig(
        n_pose=cfg.n_pose, n_betas=cfg.n_betas, n_joints=cfg.n_joints,
        scale_trans_mode="separate" if cfg.predict_scales else "ignore",
    )
    body_raw = dict(raw)
    B = raw["global_rot"].shape[0]
    body_raw.setdefault("fov", jnp.full((B, 1), 60.0))
    body_raw.setdefault("cam_rot", jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0])[None], (B, 1)))
    body_raw.setdefault("cam_trans", jnp.tile(jnp.asarray([0.0, 0, 2.7])[None], (B, 1)))
    preds = decode_predictions(rcfg_like, body_raw, spec)

    objs = {}
    gt6_g = axis_angle_to_rotation_6d(gt_params["global_rot"])
    gt6_j = axis_angle_to_rotation_6d(gt_params["joint_rot"]).reshape(B, -1)
    objs["param"] = w["param"] * (
        jnp.mean((raw["global_rot"] - gt6_g) ** 2)
        + jnp.mean((raw["joint_rot"] - gt6_j) ** 2)
        + jnp.mean((raw["betas"] - gt_params["betas"]) ** 2)
        + jnp.mean((raw["trans"] - gt_params["trans"]) ** 2)
    )

    from smilify_tpu.models.regressor import forward_model

    verts_pred, joints_pred = forward_model(spec, preds)
    objs["joint"] = w["joint"] * jnp.mean((joints_pred - gt_joints) ** 2)

    if w["chamfer"] > 0 and key is not None:
        from smilify_tpu.ops.mesh_ops import sample_points_from_meshes

        keys = jax.random.split(key, B)
        pred_pts = jax.vmap(
            lambda v, k: sample_points_from_meshes(v, spec.faces, chamfer_points, k)
        )(verts_pred, keys)
        tgt = clouds[:, :chamfer_points]

        def cham(a, b):
            return jnp.mean(knn_points(a, b, K=1).dists) + jnp.mean(knn_points(b, a, K=1).dists)

        objs["chamfer"] = w["chamfer"] * jnp.mean(jax.vmap(cham)(pred_pts, tgt))

    return sum(objs.values()), objs
