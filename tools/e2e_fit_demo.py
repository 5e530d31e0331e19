"""End-to-end drive of the public API: synthetic self-consistency fit.

Renders ground-truth keypoints + silhouette from a known pose of a real model
pkl, perturbs the parameters, and runs the multi-stage fitter to recover them.
This is the library's headline flow (the reference's optimize_to_joints).

Usage: python tools/e2e_fit_demo.py [--iters 15] [--size 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--model", default="/root/reference/3D_model_prep/SMILy_STICK.pkl")
    ap.add_argument("--iter-chunk", type=int, default=1,
                    help="optimization iterations per dispatch (lax.scan chain)")
    args = ap.parse_args()

    from smilify_tpu import load_model_spec, smil_forward
    from smilify_tpu.fitter import SmalFitter, FitData
    from smilify_tpu.fitter.fitter import init_params, render_frame
    from smilify_tpu.fitter.priors import shape_prior_from_spec
    from smilify_tpu.fitter.stages import test_schedule
    from smilify_tpu.render.cameras import default_camera

    t0 = time.time()
    spec = load_model_spec(args.model, align_symmetry=False)
    print(f"[load] {os.path.basename(args.model)}: V={spec.n_verts} F={spec.n_faces} "
          f"J={spec.n_joints} B={spec.n_betas} static={spec.static_joint_locations} "
          f"({time.time()-t0:.1f}s)")

    H = W = args.size
    sp = shape_prior_from_spec(spec)

    # --- ground truth: slightly bent pose, non-zero betas
    rng = np.random.RandomState(0)
    gt = init_params(spec, 1, sp)
    gt = gt.replace(
        joint_rot=jnp.asarray(rng.randn(1, spec.n_joints - 1, 3) * 0.05, dtype=jnp.float32),
        betas=jnp.asarray(rng.randn(spec.n_betas) * 0.3, dtype=jnp.float32),
        trans=jnp.asarray([[0.05, -0.02, 0.0]], dtype=jnp.float32),
    )
    theta = jnp.concatenate([gt.global_rot[:, None, :], gt.joint_rot], axis=1)
    out = smil_forward(spec, gt.betas[None], theta)
    verts = out.verts[0] + gt.trans[0]
    joints = out.joints[0] + gt.trans[0]
    cam = default_camera().replace(fov=gt.fov[0])
    sil, kp_yx = render_frame(spec, cam, verts, joints, (H, W))
    sil_np = np.asarray(sil)
    print(f"[gt render] sil coverage={sil_np.mean():.4f} "
          f"kp range y [{float(kp_yx[:,0].min()):.1f},{float(kp_yx[:,0].max()):.1f}] "
          f"x [{float(kp_yx[:,1].min()):.1f},{float(kp_yx[:,1].max()):.1f}]")
    assert 0.01 < sil_np.mean() < 0.9, "degenerate silhouette"

    data = FitData(
        rgb=None,
        sil=sil[None],
        joints=kp_yx[None],
        visibility=jnp.ones((1, kp_yx.shape[0])),
    )

    # --- fit from default init
    fitter = SmalFitter(spec, data, (H, W))
    schedule = test_schedule(args.iters)
    history = []

    def cb(stage, it, loss, objs):
        if it == 0 or it == args.iters - 1:
            parts = {k: float(v) for k, v in objs.items() if float(v) != 0.0}
            print(f"  stage {stage} it {it:3d} loss {float(loss):10.4f} " +
                  " ".join(f"{k}={v:.3f}" for k, v in sorted(parts.items())))
        history.append(float(loss))

    t0 = time.time()
    fitter.fit(schedule, callback=cb, chunk=args.iter_chunk)
    print(f"[fit] {4*args.iters} iters in {time.time()-t0:.1f}s")

    # --- recovered vs GT
    fv, fj = fitter.forward_frames()
    kp_err = float(jnp.abs(cam.project_points_yx(fj[0], (H, W)) - kp_yx).mean())
    print(f"[result] mean keypoint error: {kp_err:.2f} px "
          f"(trans err {float(jnp.abs(fitter.params.trans - gt.trans).max()):.4f})")
    return kp_err


if __name__ == "__main__":
    err = main()
    print("E2E-OK" if err < 25 else "E2E-HIGH-ERROR")
