"""Sequence-batched fitting — fit many independent clips in ONE jitted
optimization.

The reference fitter (``smal_fitter/optimize_to_joints.py``) processes one
sequence per process; throughput over a corpus of clips means launching the
script once per clip. On TPU the economics invert: a single 512² frame leaves
most of the chip idle between dispatches, and the rasterizer/LBS already
treat frames as a batch axis. This module stacks S sequences on a leading
axis and runs the *whole staged schedule* as one program:

  * every ``FitParams`` leaf gains a leading (S,) axis — including the
    per-sequence shared ``betas`` / ``log_beta_scales`` / ``joint_trans``;
  * the SMIL forward and the Pallas rasterizer see one flat (S·N) frame
    batch (the kernel's native frame-grid axis — no vmap over pallas_call);
  * every loss term keeps its per-sequence normalization and is SUMMED over
    sequences (:func:`smilify_tpu.fitter.fitter.loss_objs`). Since no
    parameter is shared across sequences and Adam is elementwise, the batched
    fit is **exactly S independent fits** — same trajectories, same results
    (``tests/test_fitter_batch.py`` asserts this) — at batched throughput;
  * temporal smoothing pairs frames within each sequence only (vmapped).

Use :class:`BatchedFitter` exactly like ``SmalFitter`` with an extra leading
sequence axis on ``FitData`` (sil (S, N, H, W), joints (S, N, K, 2),
visibility (S, N, K)); the stage machinery (traced weights, freeze masks,
``chunk`` scanning) is inherited unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from smilify_tpu.core.lbs import smil_forward
from smilify_tpu.core.spec import ModelSpec
from smilify_tpu.fitter.fitter import (
    FitData,
    FitParams,
    SmalFitter,
    _active,
    _project_frame,
    init_params,
    loss_objs,
    temporal_losses,
)
from smilify_tpu.fitter.fitter_frames import (
    _FRAME_MEAN_TERMS,
    ShardedFitterMixin,
    psum_shared_grads,
    temporal_losses_halo,
)
from smilify_tpu.fitter.priors import LimitPrior, PosePrior, ShapePrior
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.render.cameras import default_camera
from smilify_tpu.render.rasterizer import soft_silhouette


def init_params_many(spec: ModelSpec, n_seqs: int, n_frames: int,
                     shape_prior: ShapePrior, fov: float = 60.0) -> FitParams:
    """Reference init (head-on global rotation, mean betas) tiled to
    (n_seqs, ...) — every leaf gains a leading sequence axis."""
    p = init_params(spec, n_frames, shape_prior, fov)
    return jax.tree.map(lambda x: jnp.tile(x[None], (n_seqs,) + (1,) * x.ndim), p)


def _batched_smil_forward(spec: ModelSpec, params: FitParams, allow_limb_scaling: bool):
    """SMIL forward over (S, N) as one flat frame batch: broadcasts the
    per-sequence shared leaves per frame, returns world verts/joints with the
    translation applied, still flat (S·N, ...)."""
    S, N = params.global_rot.shape[:2]
    J = spec.n_joints
    B = params.betas.shape[-1]

    def flat(x):
        return x.reshape((S * N,) + x.shape[2:])

    theta = jnp.concatenate([params.global_rot[:, :, None, :], params.joint_rot], axis=2)
    betas_bc = jnp.broadcast_to(params.betas[:, None, :], (S, N, B))
    log_scales = (
        jnp.broadcast_to(params.log_beta_scales[:, None], (S, N, J, 3))
        if allow_limb_scaling else None
    )
    joint_trans = jnp.broadcast_to(params.joint_trans[:, None], (S, N, J, 3))

    out = smil_forward(
        spec, flat(betas_bc), flat(theta),
        log_scales=None if log_scales is None else flat(log_scales),
        joint_trans=flat(joint_trans),
    )
    trans_f = flat(params.trans)
    verts = out.verts + trans_f[:, None, :]
    joints3d = out.joints + trans_f[:, None, :]
    return verts, joints3d, flat(theta).reshape(S, N, J, 3), betas_bc


def forward_losses_many(
    spec: ModelSpec,
    params: FitParams,             # leaves lead with (S, ...) — see init_params_many
    data: FitData,                 # sil (S,N,H,W) | None, joints (S,N,K,2), vis (S,N,K)
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
    """Batched analogue of :func:`fitter.forward_losses`: S sequences forward
    as one flat (S·N) frame batch; loss terms are per-sequence-normalized and
    summed over sequences (sum of S independent losses)."""
    S, N = params.global_rot.shape[:2]

    verts, joints3d, theta, betas_bc = _batched_smil_forward(
        spec, params, allow_limb_scaling
    )
    if canonical_joints is not None:
        joints3d = joints3d[:, canonical_joints]

    verts_ndc, joints_r = jax.vmap(
        lambda f, v, j: _project_frame(f, v, j, image_size)
    )(params.fov.reshape(S * N), verts, joints3d)

    render_sil = _active(weights.w_reproj) and data.sil is not None
    sil_r = None
    if render_sil:
        # ONE rasterizer call: S·N frames ride the kernel's native frame-grid
        # axis (SMEM-budget sub-batching inside handles large S·N)
        sil_r = soft_silhouette(
            verts_ndc, spec.faces, image_size, znear=default_camera().znear,
            use_pallas=use_pallas, interpret=interpret,
            approx_max_faces=approx_max_faces,
        )

    vis = (
        visibility_override if visibility_override is not None else data.visibility
    ).astype(jnp.float32)

    K = joints_r.shape[-2]
    joints_r_s = joints_r.reshape(S, N, K, 2)

    if render_sil:
        H, W = image_size
        sil_r_s = sil_r.reshape(S, N, H, W)

        def per_seq(jr, th, bb, jrd, tj, vs, sr, ts):
            return loss_objs(weights, pose_prior, limit_prior, shape_prior,
                             jr, th, bb, jrd, tj, vs, sr, ts)

        objs_s = jax.vmap(per_seq)(
            params.joint_rot, theta, betas_bc, joints_r_s, data.joints, vis,
            sil_r_s, data.sil,
        )
    else:

        def per_seq(jr, th, bb, jrd, tj, vs):
            return loss_objs(weights, pose_prior, limit_prior, shape_prior,
                             jr, th, bb, jrd, tj, vs, None, None)

        objs_s = jax.vmap(per_seq)(
            params.joint_rot, theta, betas_bc, joints_r_s, data.joints, vis,
        )

    objs = {k: jnp.sum(v) for k, v in objs_s.items()}
    total = functools.reduce(lambda a, b: a + b, objs.values())
    return total, objs


class BatchedFitter(SmalFitter):
    """``SmalFitter`` over a leading sequence axis — one compile, one
    optimizer, S clips. The staged schedule, traced-weight step cache,
    freeze masks, and chunked ``lax.scan`` stepping are inherited; only the
    loss assembly and parameter initialization change shape."""

    def _init_params_from_data(self, data: FitData):
        self.n_seqs, self.n_frames = int(data.joints.shape[0]), int(data.joints.shape[1])
        self.params = init_params_many(self.spec, self.n_seqs, self.n_frames, self.shape_prior)

    def _total_loss(self, params, weights: StageWeights, visibility, data=None):
        total, objs = forward_losses_many(
            self.spec, params, self.data if data is None else data, weights,
            self.pose_prior, self.limit_prior, self.shape_prior,
            self.image_size,
            visibility_override=visibility,
            canonical_joints=self.canonical_joints,
            allow_limb_scaling=self.allow_limb_scaling,
            use_pallas=self.use_pallas, interpret=self.interpret,
            approx_max_faces=self.approx_max_faces,
        )
        tj, tg, tt = jax.vmap(lambda p: temporal_losses(p, weights.w_temp))(params)
        tj, tg, tt = jnp.sum(tj), jnp.sum(tg), jnp.sum(tt)
        objs = dict(objs, temporal_joint=tj, temporal_global=tg, temporal_trans=tt)
        return total + tj + tg + tt, objs

    def forward_frames(self):
        """SMIL forward for all sequences/frames: (S, N, V, 3), (S, N, J, 3)."""
        S, N, J = self.n_seqs, self.n_frames, self.spec.n_joints
        verts, joints, _, _ = _batched_smil_forward(
            self.spec, self.params, self.allow_limb_scaling
        )
        V = verts.shape[1]
        return verts.reshape(S, N, V, 3), joints.reshape(S, N, J, 3)

    def sequence_params(self, s: int) -> FitParams:
        """The s-th sequence's parameters as a plain single-sequence pytree
        (for per-clip export/visualization through the existing tooling)."""
        return jax.tree.map(lambda x: x[s], self.params)


class ShardedBatchedFitter(ShardedFitterMixin, BatchedFitter):
    """:class:`BatchedFitter` with the sequence axis sharded over a device
    mesh — the corpus-scale path for TPU pods.

    Clips are embarrassingly data-parallel (no parameter is shared across
    sequences), so the step runs under ``shard_map`` with every per-clip
    leaf partitioned on a 1-D ``('clips',)`` mesh and NO collectives in the
    optimization itself — each chip fits its own S/D clips, and only the
    scalar loss/objective readbacks are ``psum``-ed for reporting. The
    Pallas rasterizer runs per-shard on each device's local (S/D·N) frame
    batch, exactly as in the single-device batched fit.
    """

    def __init__(self, spec, data: FitData, image_size, mesh=None, **kwargs):
        super().__init__(spec, data, image_size, **kwargs)
        if mesh is None:
            mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("clips",))
        if len(mesh.axis_names) != 1:
            raise ValueError(f"need a 1-D mesh, got axes {mesh.axis_names}")
        self.mesh = mesh
        self._clips_axis = mesh.axis_names[0]
        n_dev = mesh.devices.size
        if self.n_seqs % n_dev:
            raise ValueError(
                f"{self.n_seqs} clips not divisible by {n_dev} devices — pad "
                f"the corpus (cli/optimize_corpus.py --shard does this)"
            )
        self._globalize_inputs()

    def _param_specs(self):
        from jax.sharding import PartitionSpec

        CLIP = PartitionSpec(self._clips_axis)
        return jax.tree.map(lambda _: CLIP, self.params), CLIP

    def _jit_step(self, one_step, chunk: int):
        from jax import shard_map
        from jax.sharding import PartitionSpec

        mesh, axis = self.mesh, self._clips_axis
        CLIP = PartitionSpec(axis)   # partition leading (S, ...) axis
        REPL = PartitionSpec()       # replicated

        def body(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
            if chunk == 1:
                params, opt_state, losses, objs = one_step(
                    params, opt_state, w_vals, lr, freeze_mask, visibility, data
                )
            else:
                def scan_body(carry, _):
                    p, s = carry
                    p, s, loss, objs = one_step(p, s, w_vals, lr, freeze_mask,
                                                visibility, data)
                    return (p, s), (loss, objs)

                (params, opt_state), (losses, objs) = jax.lax.scan(
                    scan_body, (params, opt_state), None, length=chunk
                )
            # per-shard losses are partial sums over local clips; reporting
            # wants the corpus totals (same numbers as the unsharded fit)
            losses = jax.lax.psum(losses, axis)
            objs = jax.tree.map(lambda v: jax.lax.psum(v, axis), objs)
            return params, opt_state, losses, objs

        @jax.jit
        def step(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
            # explicit per-argument specs (every FitParams leaf leads with S;
            # adam mu/nu mirror params, its count is a replicated scalar;
            # weights/lr/freeze masks are scalars; all target data is per-clip)
            in_specs = (
                jax.tree.map(lambda _: CLIP, params),
                jax.tree.map(lambda x: CLIP if getattr(x, "ndim", 0) >= 1 else REPL,
                             opt_state),
                REPL, REPL,
                jax.tree.map(lambda _: REPL, freeze_mask),
                CLIP,
                jax.tree.map(lambda _: CLIP, data),
            )
            out_specs = (
                jax.tree.map(lambda _: CLIP, params),
                jax.tree.map(lambda x: CLIP if getattr(x, "ndim", 0) >= 1 else REPL,
                             opt_state),
                REPL,  # losses (scalar or (chunk,)) — psum-replicated
                REPL,  # objs dict prefix — all scalars, psum-replicated
            )
            # check_vma=False: the varying-manual-axes tracker rejects scan
            # carries initialized from constants (the rasterizer's face-chunk
            # accumulator), and pallas_call has no replication rule anyway;
            # replication of the psum-ed outputs holds by construction
            return shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
                params, opt_state, w_vals, lr, freeze_mask, visibility, data)

        return step


class GridShardedFitter(ShardedFitterMixin, BatchedFitter):
    """:class:`BatchedFitter` over a 2-D ``('clips', 'frames')`` mesh — a
    corpus of LONG clips partitioned along both axes at once.

    Composes the two 1-D strategies (:class:`ShardedBatchedFitter` and
    :class:`~smilify_tpu.fitter.fitter_frames.ShardedSequenceFitter`): each
    device owns an (S/Dc × N/Df) tile of (clip, frame) space. Clips share
    nothing, so the 'clips' axis needs no collectives; along 'frames' the
    per-clip shared parameters (betas/scales/trans offsets) psum their
    gradients, per-clip mean-normalized loss terms scale by 1/Df, and the
    temporal-smoothing pairs across frame-shard boundaries ride a vmapped
    ppermute halo. Equivalence to the single-device batched fit is asserted
    in ``tests/test_fitter_batch.py::test_grid_sharded_matches_unsharded``.
    """

    def __init__(self, spec, data: FitData, image_size, mesh=None, **kwargs):
        super().__init__(spec, data, image_size, **kwargs)
        if mesh is None:
            devs = np.asarray(jax.devices())
            mesh = jax.sharding.Mesh(devs.reshape(len(devs), 1), ("clips", "frames"))
        if tuple(mesh.axis_names) != ("clips", "frames"):
            raise ValueError(f"need a ('clips', 'frames') mesh, got {mesh.axis_names}")
        self.mesh = mesh
        Dc, Df = mesh.devices.shape
        if self.n_seqs % Dc or self.n_frames % Df:
            raise ValueError(
                f"corpus ({self.n_seqs} clips × {self.n_frames} frames) not "
                f"divisible by the ({Dc} × {Df}) mesh"
            )
        self._globalize_inputs()

    def _param_specs(self):
        from jax.sharding import PartitionSpec

        TILE = PartitionSpec("clips", "frames")
        CLIP = PartitionSpec("clips")
        return FitParams(global_rot=TILE, joint_rot=TILE, betas=CLIP,
                         trans=TILE, fov=TILE, log_beta_scales=CLIP,
                         joint_trans=CLIP), TILE

    def _local_loss(self, params, weights: StageWeights, visibility, data):
        """Per-tile loss whose 2-axis psum (and gradients, after the 'frames'
        psum on shared leaves) equal the unsharded batched fit exactly."""
        Df = jax.lax.axis_size("frames")
        _, objs = forward_losses_many(
            self.spec, params, data, weights,
            self.pose_prior, self.limit_prior, self.shape_prior,
            self.image_size,
            visibility_override=visibility,
            canonical_joints=self.canonical_joints,
            allow_limb_scaling=self.allow_limb_scaling,
            use_pallas=self.use_pallas, interpret=self.interpret,
            approx_max_faces=self.approx_max_faces,
        )
        objs = {k: (v / Df if k in _FRAME_MEAN_TERMS else v) for k, v in objs.items()}
        # temporal: per-clip frame pairs; boundary pairs halo along 'frames'
        tj, tg, tt = jax.vmap(
            lambda p: temporal_losses_halo(p, weights.w_temp, "frames")
        )(params)
        objs = dict(objs, temporal_joint=jnp.sum(tj), temporal_global=jnp.sum(tg),
                    temporal_trans=jnp.sum(tt))
        total = functools.reduce(lambda a, b: a + b, objs.values())
        return total, objs

    def _get_step(self, structure: tuple, chunk: int = 1):
        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        if (structure, chunk) in cache:
            return cache[(structure, chunk)]

        import optax
        from jax import shard_map
        from jax.sharding import PartitionSpec

        mesh = self.mesh
        P_SPECS, TILE = self._param_specs()
        REPL = PartitionSpec()

        tx = optax.scale_by_adam(b1=0.5, b2=0.999)

        def grad_body(params, w_vals, visibility, data):
            weights = self._weights_from(structure, w_vals)

            def loss_fn(p):
                return self._local_loss(p, weights, visibility, data)

            (loss, objs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # per-clip shared leaves: sum the frame-shard partials
            grads = psum_shared_grads(grads, "frames")
            loss = jax.lax.psum(loss, ("clips", "frames"))
            objs = jax.tree.map(lambda v: jax.lax.psum(v, ("clips", "frames")), objs)
            return loss, objs, grads

        def one_step(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
            in_specs = (P_SPECS, REPL, TILE, jax.tree.map(lambda _: TILE, data))
            out_specs = (REPL, REPL, P_SPECS)
            # check_vma=False: see ShardedBatchedFitter._jit_step
            loss, objs, grads = shard_map(
                grad_body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )(params, w_vals, visibility, data)
            params, opt_state = self._apply_update(
                tx, params, opt_state, grads, lr, freeze_mask
            )
            return params, opt_state, loss, objs

        step = self._jit_step(one_step, chunk)
        cache[(structure, chunk)] = (tx, step)
        return tx, step
