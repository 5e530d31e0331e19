"""Coarse-to-fine (progressive-resolution) fitting.

The reference fits every stage at one fixed resolution
(``optimize_to_joints.py:148-175``); ``fitter/progressive.py`` adds an
opt-in pyramid. These tests pin the pyramid's semantics:

  * the data downsample is exact area averaging + 1/s joint scaling;
  * ``w_j2d`` is rescaled by s² so loss-term ratios match full resolution;
  * an all-ones scale list reproduces the plain fitter EXACTLY (same
    trajectory, bitwise);
  * a coarse stage still reduces the FULL-resolution loss (the pyramid
    optimizes the same objective; it is a convergence knob — measured NOT
    to be a wall-time win, see fitter/progressive.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from smilify_tpu.core.spec import load_model_spec
from smilify_tpu.fitter.fitter import SmalFitter, forward_losses, synthetic_fit_data
from smilify_tpu.fitter.priors import (
    default_limit_prior,
    default_pose_prior,
    shape_prior_from_spec,
)
from smilify_tpu.fitter.progressive import (
    ProgressiveFitter,
    downsample_fit_data,
    scaled_weights,
)
from smilify_tpu.fitter.stages import StageWeights

MODEL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"


@pytest.fixture(scope="module")
def spec():
    return load_model_spec(MODEL, align_symmetry=False)


@pytest.fixture(scope="module")
def data64(spec):
    return synthetic_fit_data(spec, 2, (64, 64))


def test_downsample_area_average_and_joint_scaling(spec, data64):
    d2 = downsample_fit_data(data64, 2)
    assert d2.sil.shape == (2, 32, 32)
    sil = np.asarray(data64.sil)
    expect = sil.reshape(2, 32, 2, 32, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(d2.sil), expect, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d2.joints), np.asarray(data64.joints) / 2.0, rtol=1e-6
    )
    # visibility untouched
    np.testing.assert_array_equal(np.asarray(d2.visibility), np.asarray(data64.visibility))


def test_downsample_rejects_non_divisible(spec, data64):
    with pytest.raises(ValueError, match="not divisible"):
        downsample_fit_data(data64, 3)


def test_scaled_weights_joint_term_only():
    w = StageWeights(10.0, 500.0, 1.0, 1.0, 100.0, 0.1, 100.0, 5, 1e-3)
    w4 = scaled_weights(w, 4)
    assert w4.w_j2d == pytest.approx(160.0)
    assert (w4.w_reproj, w4.w_betas, w4.w_pose, w4.w_limit, w4.w_splay, w4.w_temp) == (
        w.w_reproj, w.w_betas, w.w_pose, w.w_limit, w.w_splay, w.w_temp
    )
    assert scaled_weights(w, 1) is w


def test_all_ones_scales_match_plain_fitter_exactly(spec, data64):
    sched = [
        StageWeights(25.0, 0.0, 0.0, 0.0, 0.0, 0.0, 500.0, 4, 9e-2),
        StageWeights(10.0, 500.0, 1.0, 1.0, 100.0, 0.1, 100.0, 4, 5e-3),
    ]
    plain = SmalFitter(spec, data64, (64, 64), use_pallas=False)
    plain_losses = plain.fit(sched, chunk=2)

    prog = ProgressiveFitter(spec, data64, (64, 64), scales=(1, 1), use_pallas=False)
    prog_losses = prog.fit(sched, chunk=2)

    import jax

    for a, b in zip(plain_losses, prog_losses):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for pa, pb in zip(jax.tree.leaves(plain.params), jax.tree.leaves(prog.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_coarse_stage_reduces_full_res_loss(spec, data64):
    """Optimizing at scale 2 must reduce the loss measured at FULL resolution —
    the pyramid is a cheaper path down the same objective."""
    sched = [
        StageWeights(25.0, 0.0, 0.0, 0.0, 0.0, 0.0, 500.0, 6, 9e-2),
        StageWeights(10.0, 500.0, 1.0, 1.0, 100.0, 0.1, 100.0, 12, 5e-3),
    ]
    prog = ProgressiveFitter(spec, data64, (64, 64), scales=(1, 2), use_pallas=False)

    pp = default_pose_prior(spec)
    lp = default_limit_prior(spec)
    sp = shape_prior_from_spec(spec)

    def full_res_loss(params):
        total, _ = forward_losses(
            spec, params, data64, sched[1], pp, lp, sp, (64, 64), use_pallas=False
        )
        return float(total)

    loss_before = full_res_loss(prog.params)
    prog.fit(sched, chunk=3)
    loss_after = full_res_loss(prog.params)
    assert np.isfinite(loss_after)
    assert loss_after < loss_before, (loss_before, loss_after)


def test_progressive_cli_flag_parses(spec, tmp_path):
    """--progressive without a value selects the default 1,4,2,1 pyramid."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--progressive", nargs="?", const="1,4,2,1", default=None)
    assert ap.parse_args([]).progressive is None
    assert ap.parse_args(["--progressive"]).progressive == "1,4,2,1"
    assert ap.parse_args(["--progressive", "1,2,1"]).progressive == "1,2,1"
