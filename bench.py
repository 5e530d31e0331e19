"""Headline benchmark: SMALFitter optimization iterations/sec/chip.

Runs the full fused optimization step (SMIL LBS forward + joint projection +
Pallas soft-silhouette render + loss suite + temporal + Adam) on the flagship
config: SMILy_STICK.pkl (V=3020, F=6019, J=55), one 512×512 frame with
silhouette + 2D-keypoint + prior losses — the reference's
``optimize_to_joints`` hot loop (BASELINE.json config #3). The headline
number runs 10 iterations per dispatch via ``lax.scan`` (the fitter's
``chunk`` mode — how a production stage loop executes); the per-dispatch
single-step rate is reported alongside as ``single_dispatch_iters_per_sec``.

The fit target is a REACHABLE rendered-GT silhouette + projected joints
(``synthetic_fit_data``) — the production workload. Fitting random noise
instead drags the mesh over the whole image until the raster's spatial
culling/saturation early-outs stop firing (measured 176 → 57 it/s across 80
iterations on v5e), which benchmarks that degradation, not the step. Each
timing phase restarts from fresh params so phases are comparable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the reference implementation's **measured**
full-step throughput on this host: tools/measure_reference_baseline.py runs
the reference's own torch SMAL forward plus a faithful torch implementation
of its PyTorch3D soft-silhouette rasterizer (sigma=gamma=1e-4,
blur=log(1/1e-4−1)·σ, faces_per_pixel=100 z-nearest selection, bin_size=0 —
``p3d_renderer.py:41-52``) through the same loss suite + Adam step. Measured
2026-08-16 on this host (torch CPU, all cores): 413.9 s/iter = 0.00242 it/s
(tools/reference_baseline.json). The reference publishes no GPU numbers
(BASELINE.md) and PyTorch3D cannot be installed here, so CPU is the only
measurable reference. Like-for-like *component* ratios on this chip (same
file): SMIL forward 22× (0.58 ms vs 13.0 ms), forward+backward 31× at batch 1,
35× per-sample at batch 8 — the full-step ratio is dominated by the raster.
"""

import json
import os
import sys

os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

# Measured reference full-step throughput (see module docstring). Read from
# tools/reference_baseline.json when present so re-measuring updates the bench.
REFERENCE_BASELINE_ITERS_PER_SEC = 0.00242
BASELINE_CAVEATS = {
    # the baseline is the reference stack measured on THIS host's CPU — the
    # only measurable reference here (no CUDA/PyTorch3D). These fields make
    # the headline ratio self-describing; like-for-like component ratios on
    # matched workloads: SMIL forward 22x, fwd+bwd 31-35x.
    "baseline_host_threads": 1,
    "baseline_measured_date": "2026-08-16",
    "baseline_stack": "reference torch SMAL + faithful soft-raster, CPU",
    "component_ratio_smil_forward": 22.0,
    "component_ratio_fwd_bwd": 31.0,
}
_ref_json = os.path.join(os.path.dirname(__file__), "tools", "reference_baseline.json")
if os.path.exists(_ref_json):
    try:
        with open(_ref_json) as _f:
            _ref = json.load(_f)
        REFERENCE_BASELINE_ITERS_PER_SEC = float(_ref["full_step_512_iters_per_sec"])
        if "host_threads" in _ref:
            BASELINE_CAVEATS["baseline_host_threads"] = _ref["host_threads"]
        if "measured_date" in _ref:
            BASELINE_CAVEATS["baseline_measured_date"] = _ref["measured_date"]
    except (KeyError, ValueError):
        pass

_MODEL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
IMAGE_SIZE = (512, 512)
N_FRAMES = 1
WARMUP = 3
ITERS = 30


def main():
    import optax

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.fitter.fitter import (
        forward_losses,
        init_params,
        synthetic_fit_data,
        temporal_losses,
    )
    from smilify_tpu.fitter.priors import (
        default_limit_prior,
        default_pose_prior,
        shape_prior_from_spec,
    )
    from smilify_tpu.fitter.stages import OPT_WEIGHTS

    spec = load_model_spec(_MODEL, align_symmetry=False)
    sp = shape_prior_from_spec(spec)
    pp = default_pose_prior(spec)
    lp = default_limit_prior(spec)
    params0 = init_params(spec, N_FRAMES, sp)

    # the production workload: a REACHABLE rendered-GT silhouette + projected
    # joints. Fitting random noise instead drags the mesh over the whole image
    # until the raster's spatial culling stops firing — measured 176 → 57 it/s
    # over 80 iterations on v5e — which benchmarks the degradation, not the step.
    data = synthetic_fit_data(spec, N_FRAMES, IMAGE_SIZE)
    weights = OPT_WEIGHTS[1]  # full-loss stage

    tx = optax.adam(weights.lr, b1=0.5)

    # the CLI-default raster path: IoU-gated work-list cap on TPU (800 @512²,
    # IoU 0.992 vs exact — the reference itself truncates to 100 z-nearest
    # faces per PIXEL, p3d_renderer.py:47), exact raster off-TPU. The exact
    # path is reported alongside as exact_iters_per_sec.
    from smilify_tpu.render.rasterizer import auto_approx_max_faces

    CAP = auto_approx_max_faces(IMAGE_SIZE)

    def loss_fn(p, cap=CAP):
        total, _ = forward_losses(spec, p, data, weights, pp, lp, sp, IMAGE_SIZE,
                                  approx_max_faces=cap)
        tj, tg, tt = temporal_losses(p, weights.w_temp)
        return total + tj + tg + tt

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def step_exact(p, s):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, cap=None))(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    # production hot path: CHUNK iterations scanned per dispatch (the fitter's
    # run_stage(chunk=N) mode) — amortizes host->device dispatch latency the
    # same way the real stage loop does
    CHUNK = 10

    @jax.jit
    def chained(p, s):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), None, length=CHUNK)
        return p, s, losses[-1]

    # Timing methodology (measured necessity on this box, see
    # docs/PERFORMANCE.md §Measurement rules and tools/_timing.py): loops
    # must be DEPENDENT chains (optimizer state feeds back — they are), must
    # end in a host VALUE fetch (block_until_ready can return before
    # execution completes on the tunneled platform), and are measured at two
    # chain lengths, repeated, with the MEDIAN slope cancelling both the
    # ~20-40 ms tunnel-sync latency and the shared chip's rare hiccups.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from _timing import timeit_chain

    def as_chain(step_once):
        def chain(state):
            p, s = state
            p, s, _ = step_once(p, s)
            return p, s

        return chain

    state0 = (params0, tx.init(params0))
    single_iters_per_sec = 1.0 / timeit_chain(
        as_chain(step), state0, n1=ITERS // 3, n2=ITERS, warmup=WARMUP)
    exact_iters_per_sec = (
        1.0 / timeit_chain(as_chain(step_exact), state0,
                           n1=ITERS // 3, n2=ITERS, warmup=WARMUP)
        if CAP is not None else single_iters_per_sec)
    iters_per_sec = CHUNK / timeit_chain(
        as_chain(chained), state0, n1=1, n2=4, warmup=1)
    print(
        json.dumps(
            {
                "metric": "smal_fitter_opt_iters_per_sec_per_chip",
                "value": round(iters_per_sec, 3),
                "unit": "iters/sec (512x512, F=6019, sil+kp+priors, 1 frame, "
                        "rendered-GT fit target, 10-iter scan chain/dispatch)",
                "vs_baseline": round(iters_per_sec / REFERENCE_BASELINE_ITERS_PER_SEC, 2),
                "single_dispatch_iters_per_sec": round(single_iters_per_sec, 3),
                "raster_mode": ("exact" if CAP is None else
                                f"worklist_cap_{CAP} (CLI default; IoU 0.992 "
                                "vs exact; reference truncates to 100 "
                                "z-nearest/pixel)"),
                "exact_single_dispatch_iters_per_sec": round(exact_iters_per_sec, 3),
                # rounds 1-2 measured single-dispatch steps on a random-noise
                # target; the headline is now the chained production mode on a
                # reachable rendered-GT target (noise fits degrade the raster's
                # spatial culling within ~50 iterations and measure that
                # degradation instead of the step) — compare across rounds via
                # single_dispatch_iters_per_sec
                "measurement_change_r03": "headline=10-iter chained dispatch, rendered-GT target, "
                                          "two-length slope timing w/ value-fetch sync "
                                          "(block_until_ready returns early on the tunneled platform)",
                **BASELINE_CAVEATS,
            }
        )
    )


if __name__ == "__main__":
    main()
