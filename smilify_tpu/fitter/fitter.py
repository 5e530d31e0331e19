"""Optimization-based model fitter — the reference ``SMALFitter`` rebuilt
TPU-first (``smal_fitter/fitter.py:57-371`` + ``optimize_to_joints.py:111-182``).

Differences by design, same behavior:
  * parameters are an explicit :class:`FitParams` pytree (no nn.Module state);
  * the entire optimization step — SMIL forward over all frames, joint
    projection, Pallas soft-silhouette render, loss suite, temporal smoothing,
    Adam update — is ONE jitted function; frames are vmapped, not looped;
  * per-stage parameter freezing is a gradient mask (static per stage), and
    the fov parameter gets its own optimizer group with lr=1 as in the
    reference (``optimize_to_joints.py:117-127``);
  * losses replicate fitter.py:290-335 exactly, including the quirk that the
    2D-joint MSE divides by the total element count while invisible joints
    contribute zero.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from smilify_tpu.core.lbs import smil_forward
from smilify_tpu.core.rotations import euler_zyx_to_axis_angle
from smilify_tpu.core.spec import ModelSpec
from smilify_tpu.fitter.priors import (
    LimitPrior,
    PosePrior,
    ShapePrior,
    default_limit_prior,
    default_pose_prior,
    shape_prior_from_spec,
)
from smilify_tpu.fitter.stages import OPT_WEIGHTS, StageWeights
from smilify_tpu.render.cameras import FoVCamera, default_camera
from smilify_tpu.render.rasterizer import soft_silhouette

HIGHEST = jax.lax.Precision.HIGHEST


@struct.dataclass
class FitParams:
    """Optimizable per-sequence parameters (reference fitter.py:181-231)."""

    global_rot: jnp.ndarray        # (N, 3) axis-angle root rotation
    joint_rot: jnp.ndarray         # (N, P, 3) per-joint axis-angle
    betas: jnp.ndarray             # (B,) shared across the sequence
    trans: jnp.ndarray             # (N, 3)
    fov: jnp.ndarray               # (N,) degrees
    log_beta_scales: jnp.ndarray   # (J, 3) shared per-joint log scales
    joint_trans: jnp.ndarray       # (J, 3) shared per-joint translation offsets


class FitData(NamedTuple):
    """Target observations; silhouettes/joints use the (y, x) pixel convention."""

    rgb: Optional[np.ndarray]      # (N, H, W, 3) float in [0, 1] (host-side, viz only)
    sil: Optional[jnp.ndarray]     # (N, H, W) float silhouettes
    joints: jnp.ndarray            # (N, K, 2) (row, col) pixel targets
    visibility: jnp.ndarray        # (N, K) {0, 1}


# the reference's head-on init: eul_to_axis([-π/2, 0, -π/2]) (fitter.py:206-209)
def _default_global_rotation() -> np.ndarray:
    return euler_zyx_to_axis_angle(np.array([-np.pi / 2, 0.0, -np.pi / 2]))


def init_params(spec: ModelSpec, n_frames: int, shape_prior: ShapePrior, fov: float = 60.0) -> FitParams:
    g0 = jnp.asarray(_default_global_rotation(), dtype=jnp.float32)
    return FitParams(
        global_rot=jnp.tile(g0[None], (n_frames, 1)),
        joint_rot=jnp.zeros((n_frames, spec.n_joints - 1, 3)),
        betas=jnp.asarray(shape_prior.mean_betas),
        trans=jnp.zeros((n_frames, 3)),
        # explicit dtype: a weak-typed leaf (python-scalar fill) becomes strong
        # after one optimizer step, changing the jit signature and forcing a
        # second compile of every step function (measured ~7 s each on v5e)
        fov=jnp.full((n_frames,), fov, dtype=jnp.float32),
        log_beta_scales=jnp.zeros((spec.n_joints, 3)),
        joint_trans=jnp.zeros((spec.n_joints, 3)),
    )


def synthetic_fit_data(
    spec: ModelSpec,
    n_frames: int,
    image_size: Tuple[int, int],
    seed: int = 42,
    fov: float = 60.0,
    use_pallas: Optional[bool] = None,
) -> FitData:
    """Reachable ground-truth fit targets: perturbed poses of ``spec`` rendered
    to binary silhouettes plus projected (y, x) joints — the production fitting
    workload (what ``optimize_to_joints`` sees on real data).

    Benchmarks MUST fit this, not random noise: a noise silhouette drags the
    mesh until it covers the whole image, at which point the raster's spatial
    culling and saturation early-outs stop firing and the measured step is
    ~3-4x slower than the same step on any real fit (measured on v5e: 176 →
    57 it/s over 80 iterations against a noise target; flat on this target).
    """
    rng = np.random.RandomState(seed)
    J = spec.n_joints
    g0 = _default_global_rotation()
    theta = np.zeros((n_frames, J, 3), np.float32)
    theta[:, 0] = g0 + rng.uniform(-0.15, 0.15, (n_frames, 3))
    theta[:, 1:] = rng.uniform(-0.06, 0.06, (n_frames, J - 1, 3))
    betas = spec.shape_mean_betas[None] + 0.3 * rng.uniform(
        -0.5, 0.5, (n_frames, spec.n_betas)
    ).astype(np.float32)
    trans = rng.uniform(-0.05, 0.05, (n_frames, 3)).astype(np.float32)

    cam = default_camera(fov=fov)

    @jax.jit
    def _gt(betas, theta, trans):
        out = smil_forward(spec, betas, theta)
        verts = out.verts + trans[:, None]
        joints3d = out.joints + trans[:, None]
        proj = jax.vmap(lambda j: cam.project_points_yx(j, image_size))(joints3d)
        pv = jax.vmap(cam.world_to_view)(verts)
        ndc = jax.vmap(cam.view_to_ndc)(pv)
        vb = jnp.concatenate([ndc[..., :2], pv[..., 2:3]], axis=-1)
        sil = soft_silhouette(
            vb, spec.faces, image_size, znear=cam.znear, use_pallas=use_pallas
        )
        return (sil > 0.5).astype(jnp.float32), proj

    sil, proj = _gt(jnp.asarray(betas), jnp.asarray(theta), jnp.asarray(trans))
    return FitData(
        rgb=None,
        sil=sil,
        joints=proj,
        visibility=jnp.ones((n_frames, J), jnp.float32),
    )


def render_frame(
    spec: ModelSpec,
    camera: FoVCamera,
    verts: jnp.ndarray,
    joints: jnp.ndarray,
    image_size: Tuple[int, int],
    render_sil: bool = True,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
):
    """Project joints to (y, x) pixels and optionally rasterize the silhouette."""
    proj_yx = camera.project_points_yx(joints, image_size)
    sil = None
    if render_sil:
        pts_view = camera.world_to_view(verts)
        ndc = camera.view_to_ndc(pts_view)
        verts_ndc = jnp.concatenate([ndc[:, :2], pts_view[:, 2:3]], axis=1)
        sil = soft_silhouette(
            verts_ndc, spec.faces, image_size, znear=camera.znear,
            use_pallas=use_pallas, interpret=interpret,
        )
    return sil, proj_yx



def _active(w) -> bool:
    """Loss-term activity check that works for python floats AND traced
    scalars: a traced weight means the term is active with a dynamic value
    (the single-compile stage machinery passes inactive terms as python 0.0,
    active terms as tracers)."""
    return not (isinstance(w, (int, float)) and w == 0)


def _project_frame(fov, verts, joints3d, image_size):
    """Per-frame camera math (cheap; silhouettes rasterize batched elsewhere)."""
    cam = default_camera().replace(fov=fov)
    proj_yx = cam.project_points_yx(joints3d, image_size)
    pts_view = cam.world_to_view(verts)
    ndc = cam.view_to_ndc(pts_view)
    verts_ndc = jnp.concatenate([ndc[:, :2], pts_view[:, 2:3]], axis=1)
    return verts_ndc, proj_yx


def loss_objs(
    weights: StageWeights,
    pose_prior: PosePrior,
    limit_prior: LimitPrior,
    shape_prior: ShapePrior,
    joint_rot: jnp.ndarray,       # (N, P, 3)
    theta: jnp.ndarray,           # (N, J, 3)
    betas: jnp.ndarray,           # (N, B) broadcast per frame
    joints_r: jnp.ndarray,        # (N, K, 2) projected (y, x) pixels
    target_joints: jnp.ndarray,   # (N, K, 2)
    vis: jnp.ndarray,             # (N, K) float
    sil_r: Optional[jnp.ndarray],       # (N, H, W) rendered, or None
    target_sil: Optional[jnp.ndarray],  # (N, H, W) target, or None
):
    """The per-sequence weighted loss terms (reference fitter.py:290-335).

    Factored out of :func:`forward_losses` so the batched multi-sequence
    fitter (:mod:`fitter_batch`) can vmap it over a sequence axis — each
    term keeps its per-sequence normalization, making a batched fit exactly
    the sum of S independent fits."""
    objs = {}
    if _active(weights.w_j2d):
        # reference sets both sides to −1 where invisible → zero contribution,
        # but the mean divides by the full element count (fitter.py:292-296)
        diff = (joints_r - target_joints) * vis[..., None]
        objs["joint"] = weights.w_j2d * jnp.sum(diff**2) / (diff.size)

    if _active(weights.w_limit):
        objs["limit"] = weights.w_limit * limit_prior(joint_rot)

    if _active(weights.w_pose):
        objs["pose"] = weights.w_pose * jnp.mean(pose_prior(theta))

    if _active(weights.w_splay):
        objs["splay"] = weights.w_splay * jnp.sum(joint_rot[:, :, (0, 2)] ** 2)

    if _active(weights.w_betas):
        objs["betas"] = weights.w_betas * shape_prior(betas)

    if _active(weights.w_reproj) and sil_r is not None and target_sil is not None:
        objs["sil_reproj"] = weights.w_reproj * jnp.mean(jnp.abs(sil_r - target_sil))
    return objs


def forward_losses(
    spec: ModelSpec,
    params: FitParams,
    data: FitData,
    weights: StageWeights,
    pose_prior: PosePrior,
    limit_prior: LimitPrior,
    shape_prior: ShapePrior,
    image_size: Tuple[int, int],
    visibility_override: Optional[jnp.ndarray] = None,
    canonical_joints: Optional[jnp.ndarray] = None,
    allow_limb_scaling: bool = True,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    approx_max_faces: Optional[int] = None,
):
    """Full loss over all frames. Returns (total, dict of weighted components).

    ``approx_max_faces`` opts into the work-list raster (z-nearest per-tile
    face cap — the reference's faces_per_pixel=100 approximation)."""
    N = params.global_rot.shape[0]
    J = spec.n_joints

    theta = jnp.concatenate([params.global_rot[:, None, :], params.joint_rot], axis=1)
    log_scales = (
        jnp.broadcast_to(params.log_beta_scales, (N, J, 3)) if allow_limb_scaling else None
    )
    joint_trans = jnp.broadcast_to(params.joint_trans, (N, J, 3))
    betas = jnp.broadcast_to(params.betas, (N, params.betas.shape[0]))

    out = smil_forward(spec, betas, theta, log_scales=log_scales, joint_trans=joint_trans)
    verts = out.verts + params.trans[:, None, :]
    joints3d = out.joints + params.trans[:, None, :]
    if canonical_joints is not None:
        joints3d = joints3d[:, canonical_joints]

    render_sil = _active(weights.w_reproj) and data.sil is not None

    verts_ndc, joints_r = jax.vmap(
        lambda f, v, j: _project_frame(f, v, j, image_size)
    )(params.fov, verts, joints3d)
    sil_r = None
    if render_sil:
        # one batched rasterizer call — frames ride the kernel grid, not vmap
        sil_r = soft_silhouette(
            verts_ndc, spec.faces, image_size, znear=default_camera().znear,
            use_pallas=use_pallas, interpret=interpret,
            approx_max_faces=approx_max_faces,
        )

    vis = (
        visibility_override if visibility_override is not None else data.visibility
    ).astype(jnp.float32)

    objs = loss_objs(
        weights, pose_prior, limit_prior, shape_prior,
        params.joint_rot, theta, betas, joints_r, data.joints, vis,
        sil_r, data.sil if render_sil else None,
    )
    total = functools.reduce(lambda a, b: a + b, objs.values())
    return total, objs


def temporal_losses(params: FitParams, w_temp: float):
    """Consecutive-frame smoothing (reference fitter.py:337-350): per-pair MSE
    summed over the sequence, separately for joints / global rotation / trans."""

    def pair_sum(x):
        if x.shape[0] < 2:
            return jnp.asarray(0.0, dtype=x.dtype)
        d = x[1:] - x[:-1]
        # per-pair mean over the parameter dims, summed over pairs
        per_pair = jnp.mean(d.reshape(d.shape[0], -1) ** 2, axis=1)
        return jnp.sum(per_pair) * w_temp

    return pair_sum(params.joint_rot), pair_sum(params.global_rot), pair_sum(params.trans)


class SmalFitter:
    """Host-side driver around the jitted optimization step.

    Mirrors the reference stage loop (``optimize_to_joints.py:111-182``):
    Adam(β1=0.5) with a dedicated lr=1 group for ``fov``; stage 0 freezes
    pose/betas/scales and restricts visibility to the torso joints.
    """

    def __init__(
        self,
        spec: ModelSpec,
        data: FitData,
        image_size: Tuple[int, int],
        pose_prior: Optional[PosePrior] = None,
        limit_prior: Optional[LimitPrior] = None,
        shape_prior: Optional[ShapePrior] = None,
        canonical_joints: Optional[np.ndarray] = None,
        allow_limb_scaling: bool = True,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
        approx_max_faces: Optional[int] = None,
    ):
        self.spec = spec
        self.data = data
        self.image_size = tuple(image_size)
        self.pose_prior = pose_prior or default_pose_prior(spec)
        self.limit_prior = limit_prior or default_limit_prior(spec)
        self.shape_prior = shape_prior or shape_prior_from_spec(spec)
        self.canonical_joints = (
            jnp.asarray(canonical_joints) if canonical_joints is not None else None
        )
        self.allow_limb_scaling = allow_limb_scaling
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.approx_max_faces = approx_max_faces
        self._init_params_from_data(data)

        # stage-0 torso-only visibility (optimize_to_joints.py:129-146);
        # joints are the LAST axis so this also covers (S, N, K) batched data
        vis = np.asarray(data.visibility, dtype=np.float32)
        torso_vis = np.zeros_like(vis)
        if spec.torso_joints:
            torso_vis[..., list(spec.torso_joints)] = vis[..., list(spec.torso_joints)]
        self._torso_visibility = jnp.asarray(torso_vis)

    def _init_params_from_data(self, data: FitData):
        """Decompose the data axes and allocate initial parameters (the
        batched corpus fitter overrides this: its leading axis is clips,
        not frames)."""
        self.n_frames = int(data.joints.shape[0])
        self.params = init_params(self.spec, self.n_frames, self.shape_prior)

    # --- one jitted step per (stage weights, freeze mask) ---

    def _total_loss(self, params, weights: StageWeights, visibility, data=None):
        """Full loss + component dict for one step (overridden by the
        multi-sequence :class:`~smilify_tpu.fitter.fitter_batch.BatchedFitter`).
        ``data`` defaults to the fitter's own targets; the sharded corpus
        fitter passes each device's local shard instead."""
        total, objs = forward_losses(
            self.spec, params, self.data if data is None else data, weights,
            self.pose_prior, self.limit_prior, self.shape_prior,
            self.image_size,
            visibility_override=visibility,
            canonical_joints=self.canonical_joints,
            allow_limb_scaling=self.allow_limb_scaling,
            use_pallas=self.use_pallas, interpret=self.interpret,
            approx_max_faces=self.approx_max_faces,
        )
        tj, tg, tt = temporal_losses(params, weights.w_temp)
        objs = dict(objs, temporal_joint=tj, temporal_global=tg, temporal_trans=tt)
        return total + tj + tg + tt, objs

    # loss terms whose values become traced step inputs (lr too) — every
    # stage with the same ACTIVITY pattern shares ONE compiled step, so the
    # full 4-stage schedule compiles twice (stage 0: no raster; stages 1-3:
    # full loss) instead of four times
    _WEIGHT_FIELDS = ("w_j2d", "w_reproj", "w_betas", "w_pose", "w_limit", "w_splay", "w_temp")

    def _get_step(self, structure: tuple, chunk: int = 1):
        """One compiled step per loss-activity pattern; weights/lr/freeze/
        visibility are traced inputs (reference rebuilds an Adam per stage,
        optimize_to_joints.py:117-127 — adam moments re-init per stage here
        too via tx.init in run_stage).

        ``chunk > 1`` compiles a ``lax.scan`` of that many optimization
        iterations per dispatch — amortizing host→device dispatch latency
        (the hot-loop analogue of the reference's tight CUDA stream; on a
        tunneled chip dispatch alone is ~0.5-1.5 ms). Losses come back
        stacked, one per iteration."""
        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        if (structure, chunk) in cache:
            return cache[(structure, chunk)]

        tx = optax.scale_by_adam(b1=0.5, b2=0.999)

        def one_step(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
            weights = self._weights_from(structure, w_vals)

            def loss_fn(p):
                return self._total_loss(p, weights, visibility, data)

            (loss, objs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            params, opt_state = self._apply_update(
                tx, params, opt_state, grads, lr, freeze_mask
            )
            return params, opt_state, loss, objs

        step = self._jit_step(one_step, chunk)
        cache[(structure, chunk)] = (tx, step)
        return tx, step

    def _weights_from(self, structure: tuple, w_vals) -> StageWeights:
        """Rebuild a StageWeights from the traced active-weight vector (the
        activity pattern is static, the values are step inputs)."""
        kw, i = {}, 0
        for f, on in zip(self._WEIGHT_FIELDS, structure):
            if on:
                kw[f] = w_vals[i]
                i += 1
            else:
                kw[f] = 0.0
        return StageWeights(num_iters=0, lr=0.0, **kw)

    def _apply_update(self, tx, params, opt_state, grads, lr, freeze_mask):
        """Freeze-masked Adam update; fov keeps its dedicated lr=1 group
        (reference optimize_to_joints.py:117-127)."""
        grads = jax.tree.map(lambda g, m: g * m, grads, freeze_mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = FitParams(
            global_rot=updates.global_rot * (-lr),
            joint_rot=updates.joint_rot * (-lr),
            betas=updates.betas * (-lr),
            trans=updates.trans * (-lr),
            fov=updates.fov * (-1.0),
            log_beta_scales=updates.log_beta_scales * (-lr),
            joint_trans=updates.joint_trans * (-lr),
        )
        return optax.apply_updates(params, updates), opt_state

    def _jit_step(self, one_step, chunk: int):
        """Compile ``one_step`` (or a ``chunk``-long lax.scan chain of it) into
        one dispatchable function. The sharded corpus fitter overrides this to
        wrap the same body in a shard_map over a device mesh."""
        if chunk == 1:
            @jax.jit
            def step(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
                return one_step(params, opt_state, w_vals, lr, freeze_mask, visibility, data)
        else:
            @jax.jit
            def step(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
                def body(carry, _):
                    p, s = carry
                    p, s, loss, objs = one_step(p, s, w_vals, lr, freeze_mask, visibility, data)
                    return (p, s), (loss, objs)

                (params, opt_state), (losses, objs) = jax.lax.scan(
                    body, (params, opt_state), None, length=chunk
                )
                return params, opt_state, losses, objs

        return step

    def _init_opt_state(self, tx):
        """Fresh per-stage optimizer state (reference rebuilds Adam per stage).
        Sharded fitters jit this: eager ops on multi-host global arrays are
        rejected outside jit."""
        return tx.init(self.params)

    def _freeze_mask(self, freeze: dict) -> FitParams:
        def m(name, default=False):
            return jnp.asarray(0.0 if freeze.get(name, default) else 1.0, jnp.float32)

        return FitParams(
            global_rot=m("global_rot"), joint_rot=m("joint_rot"), betas=m("betas"),
            trans=m("trans"), fov=m("fov"), log_beta_scales=m("log_beta_scales"),
            joint_trans=m("joint_trans", True),
        )

    def run_stage(self, stage_id: int, weights: StageWeights, callback=None,
                  chunk: int = 1):
        """Run one optimization stage. ``chunk`` scans that many iterations
        per device dispatch (remainder iterations run singly); per-iteration
        losses still reach ``callback``, read back once per chunk."""
        freeze = {}
        if stage_id == 0:
            freeze = {
                "joint_rot": True,
                "betas": True,
                "log_beta_scales": True,
                "torso_only": True,
            }
        elif not self.allow_limb_scaling:
            freeze = {"log_beta_scales": True}

        structure = tuple(getattr(weights, f) > 0 for f in self._WEIGHT_FIELDS)
        w_vals = jnp.asarray(
            [getattr(weights, f) for f, on in zip(self._WEIGHT_FIELDS, structure) if on],
            jnp.float32,
        )
        lr = jnp.asarray(weights.lr, jnp.float32)
        freeze_mask = self._freeze_mask(freeze)
        visibility = (
            self._torso_visibility if freeze.get("torso_only", False) else self.data.visibility
        )

        chunk = max(1, min(int(chunk), weights.num_iters or 1))
        tx, step = self._get_step(structure, chunk)
        opt_state = self._init_opt_state(tx)
        # traced target data: rgb stays host-side (viz only, never in the loss)
        data = self.data._replace(rgb=None)
        loss = None
        it = 0
        while it < weights.num_iters:
            if weights.num_iters - it >= chunk:
                self.params, opt_state, losses, objs = step(
                    self.params, opt_state, w_vals, lr, freeze_mask, visibility, data
                )
                n = chunk
            else:
                _, step1 = self._get_step(structure, 1)
                self.params, opt_state, losses, objs = step1(
                    self.params, opt_state, w_vals, lr, freeze_mask, visibility, data
                )
                n = 1
            if chunk == 1 or n == 1:
                loss = losses
                if callback is not None:
                    callback(stage_id, it, loss, objs)
            else:
                loss = losses[-1]
                if callback is not None:
                    # ONE device→host readback per chunk; callbacks then see
                    # host scalars (float() on them is free)
                    losses_h, objs_h = jax.device_get((losses, objs))
                    for j in range(n):
                        callback(stage_id, it + j, losses_h[j],
                                 {k: v[j] for k, v in objs_h.items()})
            it += n
        return loss

    def fit(self, schedule=None, callback=None, chunk: int = 1):
        schedule = schedule if schedule is not None else OPT_WEIGHTS
        losses = []
        for stage_id, weights in enumerate(schedule):
            losses.append(self.run_stage(stage_id, weights, callback=callback, chunk=chunk))
        return losses

    # --- inference/rendering helpers ---

    def forward_frames(self):
        """SMIL forward for all frames with the current parameters."""
        N, J = self.n_frames, self.spec.n_joints
        theta = jnp.concatenate([self.params.global_rot[:, None, :], self.params.joint_rot], axis=1)
        log_scales = (
            jnp.broadcast_to(self.params.log_beta_scales, (N, J, 3))
            if self.allow_limb_scaling
            else None
        )
        joint_trans = jnp.broadcast_to(self.params.joint_trans, (N, J, 3))
        betas = jnp.broadcast_to(self.params.betas, (N, self.params.betas.shape[0]))
        out = smil_forward(self.spec, betas, theta, log_scales=log_scales, joint_trans=joint_trans)
        verts = out.verts + self.params.trans[:, None, :]
        joints = out.joints + self.params.trans[:, None, :]
        return verts, joints
