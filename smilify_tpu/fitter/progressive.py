"""Coarse-to-fine (progressive-resolution) fitting.

The reference runs every optimization stage at the full image size
(``optimize_to_joints.py:148-175`` — one fixed ``config.IMG_RES``). This
fitter instead runs early raster stages on a downsampled silhouette pyramid
and hands the parameters up to the next resolution — the classic
coarse-to-fine trick for widening the silhouette loss's basin of attraction
(a 4×-downsampled soft silhouette is effectively a 4×-blurred one, so early
stages see gradient signal from farther away).

**This is a convergence/robustness knob, NOT a wall-time win on TPU.**
Measured on the v5e (single frame, 512², chunk=10, warm): the fused
LBS+raster+loss+Adam step costs 3.36 ms/iter at 512², 2.10 at 256², 2.42 at
128² — the step is dominated by resolution-independent work (FK/LBS, priors,
Adam, scan bookkeeping) and tile-padding floors, not by raster pixels, so the
pyramid can save at most ~8% of the full schedule and in practice loses that
to per-scale trace/compile overhead (see ``tools/progressive_bench.json``).
Use it when a sequence mis-converges at full resolution, not to go faster.

Loss-semantics note: the silhouette term is a per-pixel mean (resolution
invariant), the priors/temporal terms act on parameters (invariant), but the
2D joint term is squared PIXEL error — scaling the image by 1/s scales it by
1/s². ``fit_progressive`` multiplies ``w_j2d`` by s² per stage so the term
*ratios* (and therefore the optimization trajectory) match the full-resolution
schedule's intent at every scale.

Each distinct scale is its own :class:`~smilify_tpu.fitter.fitter.SmalFitter`
(static shapes per XLA compile); parameters and Adam restarts carry across
exactly like the reference's per-stage optimizer rebuilds.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from smilify_tpu.fitter.fitter import FitData, SmalFitter
from smilify_tpu.fitter.stages import OPT_WEIGHTS, StageWeights

# raster-free stages (stage 0) run at scale 1 implicitly; this default maps
# the reference 4-stage table to a 4× → 2× → full pyramid
DEFAULT_SCALES = (1, 4, 2, 1)


def downsample_fit_data(data: FitData, scale: int) -> FitData:
    """Area-average the silhouette targets and rescale pixel-space joints by
    ``1/scale``. Image dims must be divisible by ``scale``; visibility and rgb
    (host-side viz only) pass through unchanged."""
    if scale == 1:
        return data
    sil = data.sil
    if sil is not None:
        H, W = sil.shape[-2], sil.shape[-1]
        if H % scale or W % scale:
            raise ValueError(
                f"image size ({H}, {W}) not divisible by pyramid scale {scale}"
            )
        lead = sil.shape[:-2]
        sil = jnp.asarray(sil).reshape(
            *lead, H // scale, scale, W // scale, scale
        ).mean(axis=(-3, -1))
    joints = data.joints if data.joints is None else jnp.asarray(data.joints) / scale
    return data._replace(sil=sil, joints=joints)


def scaled_weights(weights: StageWeights, scale: int) -> StageWeights:
    """Keep loss-term ratios constant across the pyramid: the joint term is
    squared pixel error (scales 1/s² when coordinates scale 1/s), everything
    else is resolution invariant."""
    if scale == 1:
        return weights
    return weights._replace(w_j2d=weights.w_j2d * scale * scale)


class ProgressiveFitter:
    """Drives one :class:`SmalFitter` per pyramid scale, sharing parameters.

    Presents the same ``run_stage``/``fit`` surface as ``SmalFitter`` so the
    CLI and visualization paths are interchangeable; ``fitter`` exposes the
    full-resolution instance for rendering/export."""

    def __init__(
        self,
        spec,
        data: FitData,
        image_size: Tuple[int, int],
        scales: Sequence[int] = DEFAULT_SCALES,
        **fitter_kwargs,
    ):
        self.spec = spec
        self.image_size = tuple(image_size)
        self.scales = tuple(int(s) for s in scales)
        if any(s < 1 for s in self.scales):
            raise ValueError(f"pyramid scales must be >= 1, got {self.scales}")
        self._data = data
        self._kwargs = dict(fitter_kwargs)
        self._fitters = {}
        # the full-res fitter always exists: it owns the canonical params and
        # serves rendering/export
        self._fitters[1] = SmalFitter(spec, data, self.image_size, **self._kwargs)

    @property
    def fitter(self) -> SmalFitter:
        """The full-resolution fitter (canonical parameter holder)."""
        return self._fitters[1]

    @property
    def n_frames(self) -> int:
        return self._fitters[1].n_frames

    @property
    def params(self):
        return self._fitters[1].params

    @params.setter
    def params(self, value):
        self._fitters[1].params = value

    def _fitter_at(self, scale: int) -> SmalFitter:
        if scale not in self._fitters:
            H, W = self.image_size
            self._fitters[scale] = SmalFitter(
                self.spec,
                downsample_fit_data(self._data, scale),
                (H // scale, W // scale),
                **self._kwargs,
            )
        return self._fitters[scale]

    def run_stage(self, stage_id: int, weights: StageWeights, callback=None,
                  chunk: int = 1, scale: Optional[int] = None):
        if scale is None:
            scale = self.scales[stage_id] if stage_id < len(self.scales) else 1
        f = self._fitter_at(scale)
        f.params = self._fitters[1].params
        loss = f.run_stage(stage_id, scaled_weights(weights, scale),
                           callback=callback, chunk=chunk)
        self._fitters[1].params = f.params
        return loss

    def fit(self, schedule: Optional[List[StageWeights]] = None, callback=None,
            chunk: int = 1):
        schedule = schedule if schedule is not None else OPT_WEIGHTS
        return [
            self.run_stage(i, w, callback=callback, chunk=chunk)
            for i, w in enumerate(schedule)
        ]

    def forward_frames(self):
        return self._fitters[1].forward_frames()
