"""Measure the reference implementation's throughput on this host (torch CPU).

The reference publishes no numbers (BASELINE.md) and its renderer requires
PyTorch3D (absent here), so we measure what CAN run: the full SMAL forward
(blendshapes + rodrigues + FK + LBS skinning + joint regression) — the
non-raster half of the fitter step — and a gradient step over it. Results are
written to tools/reference_baseline.json for bench.py's vs_baseline.

Run separately from any jax process (torch+jax in one process hangs here):
  python tools/measure_reference_baseline.py
"""

import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "reference_baseline.json")


def main():
    sys.path.insert(0, REFERENCE)
    cfg = types.ModuleType("config")
    cfg.SMAL_FILE = os.path.join(REFERENCE, "3D_model_prep/SMILy_STICK.pkl")
    cfg.DEBUG = False
    cfg.ignore_sym = True
    cfg.ignore_hardcoded_body = True
    cfg.STATIC_JOINT_LOCATIONS = False
    cfg.ALLOW_LIMB_SCALING = True
    sys.modules["config"] = cfg

    import numpy as np
    import torch

    from smal_model.smal_torch import SMAL

    torch.set_num_threads(os.cpu_count() or 1)
    smal = SMAL("cpu")
    J = smal.J_regressor.shape[1]
    B = smal.num_betas

    results = {"host_threads": torch.get_num_threads()}

    for batch in (1, 8):
        betas = torch.randn(batch, B) * 0.3
        theta = torch.randn(batch, J, 3) * 0.1
        trans = torch.zeros(batch, 3)
        log_scales = torch.zeros(batch, J, 3)

        # forward only
        for _ in range(3):
            smal(betas, theta, trans=trans, betas_logscale=log_scales)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            smal(betas, theta, trans=trans, betas_logscale=log_scales)
        dt = (time.perf_counter() - t0) / n
        results[f"smal_forward_b{batch}_ms"] = dt * 1000
        results[f"smal_forward_b{batch}_per_sec"] = 1.0 / dt

        # forward+backward (the fitter's per-iteration model cost minus raster)
        theta_p = theta.clone().requires_grad_(True)
        betas_p = betas.clone().requires_grad_(True)

        def step():
            v, j, r, vs = smal(betas_p, theta_p, trans=trans, betas_logscale=log_scales)
            loss = (v**2).sum() + (j**2).sum()
            loss.backward()
            theta_p.grad = None
            betas_p.grad = None

        for _ in range(3):
            step()
        t0 = time.perf_counter()
        for _ in range(n):
            step()
        dt = (time.perf_counter() - t0) / n
        results[f"smal_fwdbwd_b{batch}_ms"] = dt * 1000
        results[f"smal_fwdbwd_b{batch}_per_sec"] = 1.0 / dt

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
