"""Frame-sharded fitting — ONE long sequence optimized across a device mesh.

The corpus fitter (:mod:`fitter_batch`) scales over *independent clips*; this
module scales over the *frames of a single sequence*, which the reference
cannot express at all (its fitter holds every frame on one GPU,
``smal_fitter/fitter.py:181-231``). Frames are block-sharded on a 1-D
``('frames',)`` mesh and the optimization step runs under ``shard_map``:

  * per-frame parameters (global_rot, joint_rot, trans, fov) live on the
    device that owns their frames — gradients stay local;
  * sequence-shared parameters (betas, log_beta_scales, joint_trans) are
    replicated; their per-shard partial gradients are ``psum``-ed — the only
    collective in the loss backward;
  * mean-normalized loss terms (2D-joint MSE, priors, silhouette) are scaled
    by 1/D per shard so the psum of local losses (and every local gradient)
    equals the unsharded value exactly; sum-normalized terms (splay,
    temporal) are plain partial sums;
  * the temporal smoothing pairs that straddle shard boundaries use a halo
    exchange: each shard ``ppermute``-s its first frame's parameters to the
    previous shard, and gradient flows back through the transposed permute —
    no pair is dropped (:func:`temporal_losses_halo`);
  * the Adam update runs *outside* the shard_map on the globally-sharded
    arrays (elementwise — XLA partitions it without communication).

Equivalence to the single-device fit is asserted in
``tests/test_fitter_frames.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smilify_tpu.fitter.fitter import (
    FitData,
    FitParams,
    SmalFitter,
    _active,
    forward_losses,
)
from smilify_tpu.fitter.stages import StageWeights

# loss terms normalized by a mean over frames/pixels (global count) — their
# per-shard values must be scaled by 1/D to make psum exact; 'splay' and the
# temporal terms are sums over frames/pairs and psum as-is
_FRAME_MEAN_TERMS = frozenset({"joint", "limit", "pose", "betas", "sil_reproj"})

# FitParams leaves shared across the frame axis — the only gradients that
# need a collective when frames are sharded
_SHARED_PARAM_FIELDS = ("betas", "log_beta_scales", "joint_trans")


def psum_shared_grads(grads: FitParams, axis_name: str) -> FitParams:
    """Sum the frame-shard partial gradients of the sequence-shared leaves —
    the one collective in a frame-sharded backward."""
    return grads.replace(
        **{f: jax.lax.psum(getattr(grads, f), axis_name) for f in _SHARED_PARAM_FIELDS}
    )


class ShardedFitterMixin:
    """Multi-host input placement shared by every sharded fitter.

    Single-process runs (including the 8-virtual-device test meshes) are
    untouched. When ``jax.distributed`` is initialized and the mesh spans
    several hosts, committed process-local arrays cannot feed a jitted
    shard_map — ``_globalize_inputs`` reassembles the full per-host copies
    into global jax.Arrays (every CLI loads the whole corpus on each host),
    and the per-stage optimizer init must run under jit."""

    def _param_specs(self):
        """(FitParams spec tree, data-leaf spec) for this fitter's layout."""
        raise NotImplementedError

    def _globalize_inputs(self):
        if jax.process_count() == 1:
            return
        from smilify_tpu.train.multihost import globalize

        p_specs, d_spec = self._param_specs()
        self.params = globalize(self.params, self.mesh, p_specs)
        rgb = self.data.rgb  # host-side, viz only — never enters the step
        data_nd = self.data._replace(rgb=None)
        self.data = globalize(
            data_nd, self.mesh, jax.tree.map(lambda _: d_spec, data_nd)
        )._replace(rgb=rgb)
        self._torso_visibility = globalize(self._torso_visibility, self.mesh, d_spec)

    def _init_opt_state(self, tx):
        # eager zeros_like on non-addressable global arrays is rejected
        # outside jit in multi-host runs
        return jax.jit(tx.init)(self.params)


def temporal_losses_halo(params: FitParams, w_temp, axis_name: str):
    """Sharded analogue of :func:`fitter.temporal_losses`: per-pair MSE summed
    over the sequence. Local pairs come from the shard's own frames; the pair
    that straddles each shard boundary uses the next shard's first frame,
    fetched with a ``ppermute`` (whose transpose routes the boundary gradient
    back to the owning shard)."""
    if not _active(w_temp):
        z = jnp.asarray(0.0, dtype=params.trans.dtype)
        return z, z, z
    D = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    not_last = (idx < D - 1).astype(jnp.float32)
    perm = [(d, d - 1) for d in range(1, D)]

    def pair_sum(x):
        flat = x.reshape(x.shape[0], -1)
        s = jnp.asarray(0.0, dtype=x.dtype)
        if x.shape[0] >= 2:
            d = flat[1:] - flat[:-1]
            s = jnp.sum(jnp.mean(d**2, axis=1))
        if D > 1:
            # halo: next shard's first frame pairs with our last frame
            nxt = jax.lax.ppermute(flat[0], axis_name, perm)
            s = s + not_last * jnp.mean((nxt - flat[-1]) ** 2)
        return s * w_temp

    return pair_sum(params.joint_rot), pair_sum(params.global_rot), pair_sum(params.trans)


class ShardedSequenceFitter(ShardedFitterMixin, SmalFitter):
    """``SmalFitter`` with the frame axis sharded over a ``('frames',)`` mesh.

    Same staged schedule, same numbers (tests/test_fitter_frames.py), but a
    sequence of N frames uses D devices' memory and compute — the path for
    fitting hour-long videos on a TPU pod slice."""

    def __init__(self, spec, data: FitData, image_size, mesh=None, **kwargs):
        super().__init__(spec, data, image_size, **kwargs)
        if mesh is None:
            mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("frames",))
        if len(mesh.axis_names) != 1:
            raise ValueError(f"need a 1-D mesh, got axes {mesh.axis_names}")
        self.mesh = mesh
        self._frames_axis = mesh.axis_names[0]
        n_dev = mesh.devices.size
        if self.n_frames % n_dev:
            raise ValueError(
                f"{self.n_frames} frames not divisible by {n_dev} devices — "
                f"pad the sequence (repeat trailing frames with visibility 0)"
            )
        self._globalize_inputs()

    def _param_specs(self):
        from jax.sharding import PartitionSpec

        FRAME = PartitionSpec(self._frames_axis)
        REPL = PartitionSpec()
        return FitParams(global_rot=FRAME, joint_rot=FRAME, betas=REPL,
                         trans=FRAME, fov=FRAME, log_beta_scales=REPL,
                         joint_trans=REPL), FRAME

    def _local_loss(self, params, weights: StageWeights, visibility, data):
        """Per-shard loss whose psum AND per-frame/psum-ed-shared gradients
        equal the unsharded totals (see module docstring for the 1/D rule)."""
        D = jax.lax.axis_size(self._frames_axis)
        _, objs = forward_losses(
            self.spec, params, data, weights,
            self.pose_prior, self.limit_prior, self.shape_prior,
            self.image_size,
            visibility_override=visibility,
            canonical_joints=self.canonical_joints,
            allow_limb_scaling=self.allow_limb_scaling,
            use_pallas=self.use_pallas, interpret=self.interpret,
            approx_max_faces=self.approx_max_faces,
        )
        objs = {k: (v / D if k in _FRAME_MEAN_TERMS else v) for k, v in objs.items()}
        tj, tg, tt = temporal_losses_halo(params, weights.w_temp, self._frames_axis)
        objs = dict(objs, temporal_joint=tj, temporal_global=tg, temporal_trans=tt)
        total = jax.tree.reduce(lambda a, b: a + b, list(objs.values()))
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

        mesh, axis = self.mesh, self._frames_axis
        P_SPECS, FRAME = self._param_specs()
        REPL = PartitionSpec()

        tx = optax.scale_by_adam(b1=0.5, b2=0.999)

        def grad_body(params, w_vals, visibility, data):
            weights = self._weights_from(structure, w_vals)

            def loss_fn(p):
                return self._local_loss(p, weights, visibility, data)

            (loss, objs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = psum_shared_grads(grads, axis)
            loss = jax.lax.psum(loss, axis)
            objs = jax.tree.map(lambda v: jax.lax.psum(v, axis), objs)
            return loss, objs, grads

        def sharded_grads(params, w_vals, visibility, data):
            in_specs = (
                P_SPECS, REPL,
                FRAME,                              # visibility (N, K)
                jax.tree.map(lambda _: FRAME, data)  # sil/joints/visibility
            )
            out_specs = (REPL, REPL, P_SPECS)
            # check_vma=False: see fitter_batch.ShardedBatchedFitter._jit_step
            return shard_map(grad_body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
                params, w_vals, visibility, data)

        def one_step(params, opt_state, w_vals, lr, freeze_mask, visibility, data):
            loss, objs, grads = sharded_grads(params, w_vals, visibility, data)
            # elementwise update outside the shard_map: XLA partitions it
            # along the existing shardings with no communication
            params, opt_state = self._apply_update(
                tx, params, opt_state, grads, lr, freeze_mask
            )
            return params, opt_state, loss, objs

        step = self._jit_step(one_step, chunk)
        cache[(structure, chunk)] = (tx, step)
        return tx, step
