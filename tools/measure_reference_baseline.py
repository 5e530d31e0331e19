"""Measure the reference implementation's throughput on this host (torch CPU).

The reference publishes no numbers (BASELINE.md) and PyTorch3D cannot be
installed here, so the *full* reference fitter step is measured by combining:

  * the reference's own torch SMAL forward (imported from /root/reference),
  * a torch implementation of PyTorch3D's soft-silhouette rasterizer with the
    reference's exact settings (``p3d_renderer.py:41-52``: sigma=gamma=1e-4,
    blur_radius=log(1/1e-4−1)·sigma, faces_per_pixel=100, bin_size=0 naive
    raster, SoftSilhouetteShader aggregation) — selection of the 100
    z-nearest faces inside the blur radius is done without autograd exactly
    like the CUDA rasterizer, gradients flow through the selected faces'
    signed distances,
  * the reference loss suite shape (joint MSE + silhouette L1 + priors) and
    an Adam step (``optimize_to_joints.py:148-175``).

Also measured: the SMAL forward / forward+backward alone (component ratios).
Results are written to tools/reference_baseline.json for bench.py's
vs_baseline.

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


def _signed_sq_distance_torch(px, py, tri):
    """Signed squared point-triangle distance in NDC xy (PyTorch3D convention:
    min over the three edges' squared point-segment distance, negative inside).

    px, py: (P,) pixel NDC coords; tri: (F, 3, 2). Returns (P, F).
    """
    import torch

    P = px.shape[0]
    d_min = None
    cross_signs = []
    for e in range(3):
        a = tri[:, e]           # (F, 2)
        b = tri[:, (e + 1) % 3]
        ex, ey = (b - a).unbind(-1)                      # (F,)
        dx = px[:, None] - a[:, 0][None]                 # (P, F)
        dy = py[:, None] - a[:, 1][None]
        seg = (ex * ex + ey * ey).clamp_min(1e-12)[None]
        t = ((dx * ex[None] + dy * ey[None]) / seg).clamp(0.0, 1.0)
        rx = dx - t * ex[None]
        ry = dy - t * ey[None]
        d = rx * rx + ry * ry
        d_min = d if d_min is None else torch.minimum(d_min, d)
        cross_signs.append(ex[None] * dy - ey[None] * dx)  # (P, F)
    c0, c1, c2 = cross_signs
    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
    return torch.where(inside, -d_min, d_min)


def soft_silhouette_reference_torch(verts_ndc, faces, H, W, sigma=1e-4, K=100,
                                    pixel_chunk=2048):
    """PyTorch3D SoftSilhouetteShader semantics in plain torch (CPU).

    Two-phase like the real rasterizer: (1) a no-grad selection pass finds, per
    pixel, the K z-nearest faces whose signed squared NDC distance is within
    the blur radius (log(1/1e-4 − 1)·sigma, the reference's setting); (2) a
    differentiable pass recomputes distances for the selected faces only and
    aggregates alpha = 1 − ∏(1 − sigmoid(−d/σ)). Gradients flow through phase
    2 exactly as through PyTorch3D's rasterizer outputs.
    """
    import numpy as np
    import torch

    blur = float(np.log(1.0 / 1e-4 - 1.0) * sigma)
    tri = verts_ndc[faces]          # (F, 3, 3)
    tri_xy = tri[..., :2]
    z = tri[..., 2].mean(-1)        # (F,) — z-order proxy for face depth sort

    # pixel centers in PyTorch3D NDC (+X left, +Y up, short side spans [-1,1])
    s = min(H, W)
    ys = -(torch.arange(H, dtype=verts_ndc.dtype) * 2.0 + 1.0 - H) / s
    xs = -(torch.arange(W, dtype=verts_ndc.dtype) * 2.0 + 1.0 - W) / s
    yg, xg = torch.meshgrid(ys, xs, indexing="ij")
    px = xg.reshape(-1)
    py = yg.reshape(-1)

    sel_idx = []
    with torch.no_grad():
        for lo in range(0, px.shape[0], pixel_chunk):
            d = _signed_sq_distance_torch(px[lo:lo + pixel_chunk],
                                          py[lo:lo + pixel_chunk], tri_xy)
            in_blur = d < blur
            zz = torch.where(in_blur, z[None].expand_as(d),
                             torch.full_like(d, float("inf")))
            _, idx = torch.topk(-zz, k=min(K, zz.shape[1]), dim=1)  # K nearest z
            sel_idx.append(idx)
    sel = torch.cat(sel_idx, dim=0)  # (P, K)

    def alpha_chunk(lo, hi):
        """Differentiable alpha for pixels [lo, hi) through their K winners
        (like the CUDA kernel: gradients reach verts through the selected
        faces' signed distances only). Regathers faces from ``verts_ndc`` so
        each chunk owns an independent graph (free after its backward)."""
        tri_sel = verts_ndc[faces][..., :2][sel[lo:hi]]  # (p, K, 3, 2)
        pxc, pyc = px[lo:hi], py[lo:hi]
        d_min = None
        crosses = []
        for e in range(3):
            aa = tri_sel[..., e, :]
            bb = tri_sel[..., (e + 1) % 3, :]
            ex, ey = (bb - aa).unbind(-1)    # (p, K)
            dx = pxc[:, None] - aa[..., 0]
            dy = pyc[:, None] - aa[..., 1]
            seg = (ex * ex + ey * ey).clamp_min(1e-12)
            t = ((dx * ex + dy * ey) / seg).clamp(0.0, 1.0)
            rx = dx - t * ex
            ry = dy - t * ey
            dd = rx * rx + ry * ry
            d_min = dd if d_min is None else torch.minimum(d_min, dd)
            crosses.append(ex * dy - ey * dx)
        c0, c1, c2 = crosses
        inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
        d_sel = torch.where(inside, -d_min, d_min)
        # invalidate padded selections (pixels with < K faces in blur repeat
        # far faces — mask those beyond the blur radius)
        valid = d_sel < blur
        prob = torch.sigmoid(-d_sel / sigma) * valid
        return 1.0 - torch.prod(1.0 - prob, dim=1)

    return sel, alpha_chunk  # caller iterates chunks (bounds autograd memory)


def measure_full_reference_step(smal, results, H=512, W=512, n_iters=3):
    """Time the reference's full optimization step (SMAL fwd + soft raster +
    losses + backward + Adam) at the bench config: 512², 1 frame, sil+kp."""
    import numpy as np
    import torch

    J = smal.J_regressor.shape[1]
    B = smal.num_betas
    rng = np.random.RandomState(0)

    betas = torch.zeros(1, B, requires_grad=True)
    theta = torch.zeros(1, J, 3, requires_grad=True)
    trans = torch.zeros(1, 3, requires_grad=True)
    target_sil = torch.from_numpy((rng.rand(H, W) > 0.7).astype(np.float32))
    target_joints = torch.from_numpy(rng.rand(1, J, 2).astype(np.float32) * H)

    opt = torch.optim.Adam([betas, theta, trans], lr=1e-3, betas=(0.5, 0.999))
    fov = 60.0
    f_ndc = 1.0 / np.tan(np.radians(fov) / 2.0)

    target_flat = target_sil.reshape(-1)
    P = H * W
    bwd_chunk = 8192

    def one_step():
        opt.zero_grad()
        verts, joints, _, _ = smal(betas, theta, trans=trans)
        v = verts[0] + torch.tensor([0.0, 0.0, 2.7])      # default camera dist
        # FoV perspective to NDC (+X left/+Y up like PyTorch3D)
        zc = v[:, 2].clamp_min(1e-3)
        ndc = torch.stack([f_ndc * v[:, 0] / zc, f_ndc * v[:, 1] / zc, zc], dim=1)
        # raster works on a detached leaf; its accumulated grad re-enters the
        # SMAL graph at the end — keeps per-chunk autograd graphs independent
        ndc_leaf = ndc.detach().requires_grad_(True)
        sel, alpha_chunk = soft_silhouette_reference_torch(ndc_leaf, smal.faces.long(), H, W)
        # silhouette L1 decomposes over pixels — backward per pixel chunk keeps
        # the autograd graph over (pixels × 100 faces) bounded
        for lo in range(0, P, bwd_chunk):
            hi = min(lo + bwd_chunk, P)
            a = alpha_chunk(lo, hi)
            ((a - target_flat[lo:hi]).abs().sum() / P).backward()
        jv = joints[0] + torch.tensor([0.0, 0.0, 2.7])
        jz = jv[:, 2].clamp_min(1e-3)
        pj = torch.stack([f_ndc * jv[:, 0] / jz, f_ndc * jv[:, 1] / jz], dim=1)
        pj_px = (1.0 - pj) * 0.5 * H
        loss = (torch.nn.functional.mse_loss(pj_px, target_joints[0])
                + (theta ** 2).mean() + (betas ** 2).mean()
                + (ndc * ndc_leaf.grad).sum())   # raster grads → SMAL params
        loss.backward()
        opt.step()

    print("full-step warmup...", flush=True)
    t0 = time.perf_counter()
    one_step()  # warmup (allocations, thread pools)
    print(f"warmup step: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(n_iters):
        one_step()
        print(f"iter {i}: cumulative {time.perf_counter()-t0:.1f}s", flush=True)
    dt = (time.perf_counter() - t0) / n_iters
    results["full_step_512_ms"] = dt * 1000
    results["full_step_512_iters_per_sec"] = 1.0 / dt
    return results


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

    measure_full_reference_step(smal, results)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
