"""Trustworthy device timing on this box (tunneled TPU or 1-core CPU host).

Two measured hazards on the tunneled (axon) platform make naive timing loops
lie (see docs/PERFORMANCE.md §Measurement rules):

1. ``block_until_ready`` can return before execution completes — only a host
   VALUE fetch truly synchronizes.
2. Repeated identical dispatches whose outputs are never fetched may be
   elided: a batch-128 resnet50 forward "measured" 0.2 ms/iter with discarded
   outputs vs ~9 ms honest (chained, value-fetched, slope-corrected).

Rules implemented here: every timed loop is a DEPENDENT chain (each dispatch
consumes the previous one's output), ends in a value fetch, and is measured
at two chain lengths so the slope cancels the ~20-40 ms tunnel-sync latency.
"""

import time

import jax
import jax.numpy as jnp


def sync(state):
    """TRUE device sync: fetch ONE SCALAR of ``state`` to the host.

    The slice happens device-side so only ~4 bytes cross the tunnel —
    ``device_get`` of a whole leaf ships the full buffer at the tunnel's
    ~10 MB/s (a 77 MB image batch took ~9 s ± 1 s per fetch, drowning every
    slope it was meant to anchor)."""
    leaf = next(l for l in jax.tree.leaves(state) if hasattr(l, "dtype"))
    float(jnp.ravel(leaf)[0])


def timeit_chain(step, state, n1=8, n2=32, warmup=2, repeats=3, target_s=1.0):
    """Per-iteration steady-state seconds of a SELF-CHAINED ``step``
    (state -> state, where the expensive computation's output feeds the next
    input so no dispatch can be skipped, reordered, or served from a cache).

    Two-point slope: time n1 and n2 dependent iterations, each ended by a
    value fetch; (t2 - t1) / (n2 - n1) cancels the sync intercept. The pair
    is measured ``repeats`` times interleaved and the MEDIAN slope returned:
    the shared tunneled chip shows rare multi-second hiccups that would
    otherwise corrupt (even negate) a single-sample slope.

    n1/n2 are LOWER bounds: a probe window first estimates the per-iteration
    cost and scales both up so the n2−n1 gap covers ~``target_s`` seconds of
    real compute — fast steps measured over short windows otherwise drown in
    the ±tens-of-ms sync jitter (observed: negative slopes for 1-3 ms steps).
    """
    for _ in range(warmup):
        state = step(state)
    sync(state)

    # probe: scale the windows to the workload
    t0 = time.perf_counter()
    s = state
    for _ in range(n1):
        s = step(s)
    sync(s)
    probe = time.perf_counter() - t0
    per_est = max((probe - 0.04) / n1, 1e-5)  # ~40 ms typical sync intercept
    scale = max(1, min(64, round(target_s / (per_est * (n2 - n1)))))
    n1, n2 = n1 * scale, n2 * scale

    slopes = []
    for _ in range(repeats):
        times = []
        for n in (n1, n2):
            s = state
            t0 = time.perf_counter()
            for _ in range(n):
                s = step(s)
            sync(s)
            times.append(time.perf_counter() - t0)
        slopes.append((times[1] - times[0]) / (n2 - n1))
    slopes.sort()
    return slopes[len(slopes) // 2]
