"""Benchmark all five BASELINE.json configs on the local chip.

Writes BENCH_DETAIL.json with per-config throughput:
  1. single-frame SMIL forward (SMILy_STICK.pkl)
  2. fitter_3d chamfer registration step (ATTA_BOI ant scan)
  3. single-view SMALFitter full optimization step (512², sil+kp+priors)
  4. neuralSMIL single-view regressor inference (ResNet-50 @224²)
  5. multi-view neural inference (18-cam mouse-like / 4-cam stick, ResNet-50,
     per-camera projection + DLT triangulation)

Usage: python tools/bench_all.py  (single process; owns the TPU)

Measurement methodology (see timeit_chain): every timed loop is a DEPENDENT
chain (each dispatch consumes the previous one's output), ends in a host
value fetch, and is measured at two chain lengths so the slope cancels the
tunnel-sync latency. Anything weaker mis-measures on this box: the tunneled
runtime acknowledges ``block_until_ready`` before execution finishes and can
elide repeated identical dispatches whose results are never fetched.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
MOUSE = "/root/reference/3D_model_prep/SMILy_Mouse_static_joints.pkl"
ATTA = "/root/reference/fitter_3d/ATTA_BOI/Atta_vollenweideri_1_mg_worker.obj"


from _timing import timeit_chain  # noqa: E402  (sibling module; see its docstring)


def bench_forward(spec):
    from smilify_tpu.core.lbs import smil_forward

    res = {}
    for batch in (1, 64):
        rng = np.random.RandomState(0)
        betas = jnp.asarray(rng.randn(batch, spec.n_betas).astype(np.float32) * 0.3)
        theta = jnp.asarray(rng.randn(batch, spec.n_joints, 3).astype(np.float32) * 0.1)

        @jax.jit
        def chain(carry):
            b, t = carry
            verts = smil_forward(spec, b, t).verts
            # fold the output back in so every iteration is a fresh dependent
            # dispatch; the multiplicative term guarantees the value CHANGES
            # (an additive epsilon can round away, leaving bitwise-identical
            # chains the runtime may dedup — see _timing docstring)
            return b * (1.0 - 1e-5) + jnp.mean(verts) * 1e-7, t

        dt = timeit_chain(chain, (betas, theta), n1=64, n2=256)
        res[f"b{batch}_ms"] = dt * 1000
        res[f"b{batch}_samples_per_sec"] = batch / dt
    return res


def bench_fitter3d(spec):
    import optax

    from smilify_tpu.fitter.fitter3d import (
        StageManager, Stage, pad_target_meshes, registration_losses, init_3d_params,
        template_topology,
    )
    from smilify_tpu.utils.export import load_obj

    v, f = load_obj(ATTA)
    targets = pad_target_meshes([(v, f)], ["atta"])
    params = init_3d_params(spec, 1)
    topo = template_topology(spec)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    lw = {"chamfer": 1.0, "edge": 1.0, "normal": 0.01, "laplacian": 0.1, "sdf": 0.0}

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            total, _ = registration_losses(spec, topo, p, targets, key, lw, num_samples=3000)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)

    def chain(state):
        params, opt_state = state
        params, opt_state, _ = step(params, opt_state, key)
        return params, opt_state

    dt = timeit_chain(chain, (params, opt_state), n1=10, n2=40, warmup=3)
    return {"step_ms": dt * 1000, "iters_per_sec": 1 / dt,
            "target_verts": int(v.shape[0]), "samples": 3000}


def measure_vpu_peak_gflops():
    """Empirical VPU f32 peak via a Pallas kernel: each grid cell holds a
    (256, 1024) f32 tile in VMEM and runs ``reps`` rounds of 4 independent
    FMA streams — one HBM read+write total, so the rate is pure VPU compute.
    An XLA elementwise chain is NOT a valid peak probe here: partial fusion
    round-trips HBM between fusion sections and measures bandwidth instead
    (a 2048-op logistic map "measured" 291 GFLOP/s). Used as the MFU
    denominator (the raster is VPU-bound: no matmuls, all elementwise)."""
    from jax.experimental import pallas as pl

    # swept on v5e: (32,1024)×32 streams maximizes the FMA pipeline within
    # the 16 MB scoped-VMEM budget (1004 GFLOP/s; bigger tiles or fewer
    # streams measure 590-980)
    TILE = (32, 1024)
    GRID = 64
    reps = 128
    streams = 32

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        accs = tuple(x * (1.0 + 0.1 * i) for i in range(streams))

        def body(_, accs):
            return tuple(a * jnp.float32(0.999999) + jnp.float32(1e-9)
                         for a in accs)

        accs = jax.lax.fori_loop(0, reps, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[...] = acc

    x = jnp.full((GRID * TILE[0], TILE[1]), 0.5, jnp.float32)
    fn = jax.jit(pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(TILE, lambda i: (i, 0))],
        out_specs=pl.BlockSpec(TILE, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    ))
    # self-chaining: the output feeds the next call and drifts multiplicatively
    dt = timeit_chain(fn, x, n1=4, n2=16)
    return streams * 2 * reps * x.size / dt / 1e9


def measure_worklist_iou(spec, cap, size=512):
    """Silhouette IoU of the capped work-list raster vs the exact kernel on
    the head-on stick pose. Context: the reference itself approximates with
    100 z-nearest faces PER PIXEL (p3d_renderer.py:47); our cap is z-nearest
    faces per 32x32 tile. Measured sweep on this pose: 800→0.992, 700→0.974,
    600→0.943, 500→0.909."""
    import jax.numpy as jnp

    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.render.cameras import default_camera
    from smilify_tpu.render.rasterizer import soft_silhouette
    from smilify_tpu.utils.visualization import silhouette_iou

    out = smil_forward(spec, jnp.zeros((1, spec.n_betas)), jnp.zeros((1, spec.n_joints, 3)))
    cam = default_camera()
    pv = cam.world_to_view(out.verts[0])
    ndc = cam.view_to_ndc(pv)
    v = jnp.concatenate([ndc[:, :2], pv[:, 2:3]], axis=1)
    exact = soft_silhouette(v, spec.faces, (size, size), znear=1e-3, use_pallas=True)
    capped = soft_silhouette(v, spec.faces, (size, size), znear=1e-3,
                             use_pallas=True, approx_max_faces=cap)
    return round(float(silhouette_iou(capped, exact)), 4)


def bench_fitter_step(spec, n_frames=1, approx_max_faces=None, vpu_peak_gflops=None):
    # same as bench.py, abbreviated
    import optax

    from smilify_tpu.fitter.fitter import (
        forward_losses, init_params, synthetic_fit_data, temporal_losses,
    )
    from smilify_tpu.fitter.priors import default_limit_prior, default_pose_prior, shape_prior_from_spec
    from smilify_tpu.fitter.stages import OPT_WEIGHTS

    sp = shape_prior_from_spec(spec)
    pp = default_pose_prior(spec)
    lp = default_limit_prior(spec)
    H = W = 512
    N = n_frames
    params0 = init_params(spec, N, sp)
    # reachable rendered-GT targets — the production workload (fitting noise
    # degrades the raster's spatial culling and measures that instead; see
    # fitter.synthetic_fit_data)
    data = synthetic_fit_data(spec, N, (H, W))
    weights = OPT_WEIGHTS[1]
    tx = optax.adam(weights.lr, b1=0.5)
    params, opt_state = params0, tx.init(params0)

    def loss_fn(p):
        total, _ = forward_losses(spec, p, data, weights, pp, lp, sp, (H, W),
                                  approx_max_faces=approx_max_faces)
        tj, tg, tt = temporal_losses(p, weights.w_temp)
        return total + tj + tg + tt

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def chain_single(state):
        p, s = state
        p, s, _ = step(p, s)
        return p, s

    dt = timeit_chain(chain_single, (params, opt_state), n1=10, n2=40, warmup=3)

    # chained mode: 10 iterations scanned per dispatch (fitter run_stage chunk)
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

    # fresh params: time the same iteration range as the single-dispatch phase
    params, opt_state = params0, tx.init(params0)

    def chain_scanned(state):
        p, s = state
        p, s, _ = chained(p, s)
        return p, s

    dt_chained = timeit_chain(chain_scanned, (params, opt_state),
                              n1=1, n2=4, warmup=1) / CHUNK

    # evolve to a mid-fit pose (the regime the timing windows covered) for a
    # representative culling-work estimate
    for _ in range(25):
        params, opt_state, _ = step(params, opt_state)

    # roofline estimate: count the raster's useful work at the converged pose
    # (active 8-face×1024-pixel subgroups from the cull mask; ~60 flops per
    # point-triangle test fwd, ~100 bwd) → achieved GFLOP/s of the whole step.
    # The raster rides the VPU (element-wise math, no MXU), so the step's
    # ceiling is VPU-bound — useful to compare across kernel revisions.
    from smilify_tpu.fitter.fitter import forward_losses as _fl  # noqa: F401
    from smilify_tpu.render import rasterizer as R

    theta = jnp.concatenate([params.global_rot[:, None, :], params.joint_rot], axis=1)
    from smilify_tpu.core.lbs import smil_forward
    from smilify_tpu.render.cameras import default_camera

    out = smil_forward(spec, jnp.broadcast_to(params.betas, (N, spec.n_betas)), theta)
    cam = default_camera()
    verts_w = out.verts + params.trans[:, None, :]
    pv = jax.vmap(cam.world_to_view)(verts_w)
    ndc = jax.vmap(cam.view_to_ndc)(pv)
    vb = jnp.concatenate([ndc[..., :2], pv[..., 2:3]], axis=-1)
    tri = vb[:, spec.faces]
    valid = jnp.any(tri[..., 2] > 0.0, axis=-1)
    if approx_max_faces is not None:
        # capped per-tile work lists: the bound is the sum of list lengths
        from smilify_tpu.render.rasterizer_worklist import _tile_worklists

        k_sub = max(1, -(-approx_max_faces // R.FACE_GROUP))
        _, count = _tile_worklists(tri[..., :2], tri[..., 2], valid, H, W, 1e-4, k_sub)
        active_groups = int(np.asarray(count).sum())
    else:
        mask = np.asarray(R._tile_cull_mask(tri[..., :2], valid, H, W, 1e-4))
        active_groups = sum(bin(int(x)).count("1") for x in mask)
    tests = active_groups * R.FACE_GROUP * R.TILE_PIX
    flops = tests * 160  # fwd + bwd point-triangle work
    out = {"step_ms": dt * 1000, "iters_per_sec": 1 / dt,
           "frame_iters_per_sec": n_frames / dt, "frames": n_frames,
           "chained10_step_ms": dt_chained * 1000,
           "chained10_iters_per_sec": 1 / dt_chained,
           "chained10_frame_iters_per_sec": n_frames / dt_chained,
           "image": "512x512", "faces": int(spec.n_faces),
           "raster_mode": ("exact" if approx_max_faces is None
                           else f"worklist_top{approx_max_faces}"),
           # upper bound: every bbox-overlapping subgroup fully evaluated
           # (saturation early-outs skip a fraction of these at runtime)
           "raster_point_triangle_tests_bound": int(tests),
           "raster_work_bound_gflops": round(flops / dt / 1e9, 1),
           "roofline_note": "raster is VPU-bound elementwise work (no MXU). "
                            "work_bound_gflops counts every bbox-overlapping "
                            "subgroup as fully evaluated, so it is an UPPER "
                            "bound on achieved flops and can exceed the peak "
                            "— the excess is work the kernel's saturation "
                            "early-outs actually skipped. bound/peak >= 1 "
                            "means the kernel is at the VPU roofline and "
                            "further speed requires LESS work (the worklist "
                            "z-nearest cap)"}
    if vpu_peak_gflops:
        # the denominator is the MEASURED achievable VPU FMA rate (pallas
        # VMEM-resident kernel, measure_vpu_peak_gflops) — not a spec number
        out["vpu_peak_gflops_measured"] = round(vpu_peak_gflops, 1)
        out["raster_work_bound_over_peak_pct"] = round(
            100 * (flops / dt / 1e9) / vpu_peak_gflops, 1)
    return out


def bench_singleview_inference(spec):
    from smilify_tpu.models.regressor import RegressorConfig, SMILRegressor, decode_predictions

    cfg = RegressorConfig(backbone="resnet50", n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          decoder_dim=256, decoder_depth=4, ief_iters=3)
    model = SMILRegressor(cfg)
    # jitted init (eager init dispatches thousands of tiny ops — minutes on a
    # tunneled chip); variables are batch-agnostic, reused across batch sizes
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def infer_chain(imgs):
        (raw, _), _ = model.apply(variables, imgs, train=False, mutable=["batch_stats"])
        preds = decode_predictions(cfg, raw, spec)
        # fold the predictions back into the next batch's pixels: each timed
        # dispatch is a fresh dependent computation, and the multiplicative
        # term guarantees a bitwise change (see _timing / bench_forward note)
        return imgs * (1.0 - 1e-5) + jnp.mean(preds["trans"]) * 1e-7

    out = {"backbone": "resnet50", "resolution": 224}
    rng = np.random.RandomState(0)
    for B in (8, 128):
        imgs = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
        dt = timeit_chain(infer_chain, imgs, n1=8, n2=32)
        out[f"batch{B}_ms"] = dt * 1000
        out[f"batch{B}_images_per_sec"] = B / dt
    out["images_per_sec"] = out["batch128_images_per_sec"]  # serving throughput
    return out


def bench_singleview_train_step(spec, backbone="resnet50"):
    """Full supervised training step (forward + backward + Adam) for the
    single-view regressor — the reference's train_smil_regressor hot loop
    (param MSEs + visibility-weighted 2D keypoint loss, its replicAnt
    synthetic-data recipe). ``backbone='resnet50_gn'`` measures the GroupNorm
    training variant (no batch-statistics passes — the round-3 MFU-ceiling
    attribution, docs/PERFORMANCE.md)."""
    import optax

    from smilify_tpu.models.regressor import (
        RegressorConfig, SMILRegressor, compute_batch_loss, decode_predictions,
    )
    from smilify_tpu.train.trainer import make_train_step

    cfg = RegressorConfig(backbone=backbone, n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          decoder_dim=256, decoder_depth=4, ief_iters=3)
    model = SMILRegressor(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def apply_fn(variables, batch, train):
        out, mutated = model.apply(
            variables, batch["image"], train=train, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        raw, history = out
        preds = decode_predictions(cfg, raw, spec)
        preds["ief_history"] = history
        return preds, mutated.get("batch_stats", {})

    weights = {"global_rot": 1.0, "joint_rot": 1.0, "betas": 0.5, "trans": 1.0,
               "keypoint_2d": 1.0}

    def loss_fn(preds, batch):
        targets = {k: batch[k] for k in
                   ("global_rot", "joint_rot", "betas", "trans",
                    "keypoints_2d", "kp_visibility")}
        return compute_batch_loss(spec, cfg, preds, targets, weights,
                                  image_size=(224, 224))

    step = make_train_step(apply_fn, loss_fn, tx)

    out = {"backbone": backbone, "resolution": 224,
           "losses": "param MSEs + visibility-weighted kp2d"}
    rng = np.random.RandomState(0)
    for B in (32, 128):
        batch = {
            "image": jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32)),
            "global_rot": jnp.zeros((B, 3)),
            "joint_rot": jnp.zeros((B, spec.n_joints - 1, 3)),
            "betas": jnp.asarray(np.tile(spec.shape_mean_betas, (B, 1))),
            "trans": jnp.zeros((B, 3)),
            "keypoints_2d": jnp.asarray(rng.rand(B, spec.n_joints, 2).astype(np.float32)),
            "kp_visibility": jnp.ones((B, spec.n_joints)),
        }
        def chain(state):
            p, bs, s = state
            p, bs, s, _, _ = step(p, bs, s, batch)
            return p, bs, s

        dt = timeit_chain(chain, (params, batch_stats, opt_state), n1=5, n2=20)
        out[f"batch{B}_ms"] = dt * 1000
        out[f"batch{B}_images_per_sec"] = B / dt
    return out


def bench_multiview_train_step(spec, n_views=4, res=224):
    """Full supervised multi-view training step (forward + backward + Adam):
    shared backbone over B*V views, cross-view fusion, IEF body head, per-view
    camera heads, and the complete loss — body-param MSEs, per-view
    visibility-weighted 2D keypoints, world-space 3D keypoints, camera-param
    losses, and the differentiable DLT triangulation-consistency term — the
    reference's train_multiview_regressor hot loop (:582-661)."""
    import optax

    from smilify_tpu.models.multiview import (
        MULTIVIEW_DEFAULT_LOSS_WEIGHTS, MultiViewConfig, MultiViewSMILRegressor,
        compute_multiview_batch_loss, decode_multiview_predictions,
    )
    from smilify_tpu.train.trainer import make_train_step

    cfg = MultiViewConfig(backbone="resnet50", n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          max_views=n_views, decoder_dim=256, decoder_depth=4,
                          ief_iters=3, fusion_heads=4, fusion_layers=2,
                          camera_delta_mode=False)
    model = MultiViewSMILRegressor(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, n_views, res, res, 3)),
        jnp.ones((1, n_views), bool), jnp.arange(n_views)[None],
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def apply_fn(variables, batch, train):
        (raw, history), mutated = model.apply(
            variables, batch["images"], batch["view_mask"], batch["camera_ids"],
            train=train, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        preds = decode_multiview_predictions(cfg, raw, spec)
        preds["ief_history"] = history
        return preds, mutated.get("batch_stats", {})

    def loss_fn(preds, batch):
        return compute_multiview_batch_loss(
            spec, cfg, preds, batch["targets"], batch["view_mask"],
            MULTIVIEW_DEFAULT_LOSS_WEIGHTS, image_size=(res, res),
        )

    step = make_train_step(apply_fn, loss_fn, tx)

    out = {"backbone": "resnet50", "resolution": res, "views": n_views,
           "losses": "param MSEs + per-view kp2d + kp3d + cameras + DLT consistency"}
    rng = np.random.RandomState(0)
    K, P = spec.n_joints, spec.n_joints - 1
    eye = np.tile(np.eye(3, dtype=np.float32), (1, n_views, 1, 1))
    for B in (2, 8):
        targets = {
            "global_rot": jnp.zeros((B, 3)),
            "joint_rot": jnp.zeros((B, P, 3)),
            "betas": jnp.asarray(np.tile(spec.shape_mean_betas, (B, 1))),
            "trans": jnp.zeros((B, 3)),
            "keypoints_2d": jnp.asarray(rng.rand(B, n_views, K, 2), jnp.float32),
            "kp_visibility": jnp.ones((B, n_views, K)),
            "keypoints_3d": jnp.asarray(rng.rand(B, K, 3), jnp.float32),
            "view_fov": jnp.full((B, n_views), 60.0),
            "view_cam_rot": jnp.asarray(np.tile(eye, (B, 1, 1, 1))),
            "view_cam_trans": jnp.tile(jnp.asarray([0.0, 0, 2.7]), (B, n_views, 1)),
        }
        batch = {
            "images": jnp.asarray(rng.rand(B, n_views, res, res, 3), jnp.float32),
            "view_mask": jnp.ones((B, n_views), bool),
            "camera_ids": jnp.tile(jnp.arange(n_views)[None], (B, 1)),
            "targets": targets,
        }

        def chain(state):
            p, bs, s = state
            p, bs, s, _, _ = step(p, bs, s, batch)
            return p, bs, s

        dt = timeit_chain(chain, (params, batch_stats, opt_state), n1=5, n2=20)
        out[f"batch{B}_ms"] = dt * 1000
        out[f"batch{B}_frames_per_sec"] = B / dt
        out[f"batch{B}_view_images_per_sec"] = B * n_views / dt
    return out


def bench_multiview_inference(spec, n_views, res, label):
    from smilify_tpu.models.multiview import (
        MultiViewConfig, MultiViewSMILRegressor, decode_multiview_predictions,
        project_through_view_cameras, view_projection_matrices,
    )
    from smilify_tpu.models.regressor import forward_model
    from smilify_tpu.render.cameras import triangulate_dlt

    cfg = MultiViewConfig(backbone="resnet50", n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          max_views=n_views, decoder_dim=256, decoder_depth=4,
                          ief_iters=3, fusion_heads=4, fusion_layers=2,
                          camera_delta_mode=False)
    model = MultiViewSMILRegressor(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, n_views, res, res, 3)),
        jnp.ones((1, n_views), bool), jnp.arange(n_views)[None],
    )

    @jax.jit
    def infer_chain(carry):
        imgs, vm, cids = carry
        (raw, _), _ = model.apply(variables, imgs, vm, cids, train=False,
                                  mutable=["batch_stats"])
        preds = decode_multiview_predictions(cfg, raw, spec)
        verts, joints3d = forward_model(spec, preds)
        kp2d = project_through_view_cameras(preds, joints3d, (res, res))
        P = view_projection_matrices(preds)
        # triangulate the projected keypoints back (the inference-time
        # consistency check the reference's loss uses)
        s = res
        x_ndc = (res - 1.0 - 2.0 * kp2d[..., 1] * res) / s
        y_ndc = (res - 1.0 - 2.0 * kp2d[..., 0] * res) / s
        ndc = jnp.stack([x_ndc, y_ndc], axis=-1)
        tri = jax.vmap(lambda n, p: triangulate_dlt(n, p, jnp.ones(n.shape[0], bool)))(ndc, P)
        # dependent-chain fold; multiplicative term guarantees a bitwise
        # change (see _timing / bench_forward note)
        return imgs * (1.0 - 1e-5) + (jnp.mean(kp2d) + jnp.mean(tri)) * 1e-8, vm, cids

    out = {"views": n_views, "resolution": res}
    rng = np.random.RandomState(0)
    for B in (1, 8):
        imgs = jnp.asarray(rng.rand(B, n_views, res, res, 3).astype(np.float32))
        vm = jnp.ones((B, n_views), bool)
        cids = jnp.tile(jnp.arange(n_views)[None], (B, 1))
        dt = timeit_chain(infer_chain, (imgs, vm, cids), n1=5, n2=20)
        out[f"{label}_b{B}_ms"] = dt * 1000
        out[f"{label}_b{B}_frames_per_sec"] = B / dt
    out[f"{label}_frames_per_sec"] = out[f"{label}_b8_frames_per_sec"]
    return out


def main():
    import argparse

    from smilify_tpu.core.spec import load_model_spec

    ap = argparse.ArgumentParser(description="detailed benchmark suite")
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only configs whose key contains any of these "
                         "substrings; results merge into the existing "
                         "BENCH_DETAIL.json instead of replacing it")
    args = ap.parse_args()

    stick = load_model_spec(STICK, align_symmetry=False)
    mouse = load_model_spec(MOUSE, align_symmetry=False)

    def wanted(key):
        return args.only is None or any(s in key for s in args.only)

    report = {"device": str(jax.devices()[0]), "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    if wanted("config1_smil_forward_stick"):
        print("1/5 SMIL forward ...", flush=True)
        report["config1_smil_forward_stick"] = bench_forward(stick)
    if wanted("config2_fitter3d_atta"):
        print("2/5 fitter_3d chamfer registration ...", flush=True)
        report["config2_fitter3d_atta"] = bench_fitter3d(stick)
    if any(wanted(f"config3{s}") for s in ("", "b", "c", "d")):
        vpu_peak = measure_vpu_peak_gflops()
        print(f"measured VPU FMA peak: {vpu_peak:.0f} GFLOP/s", flush=True)
    if wanted("config3_smalfitter_512"):
        print("3/5 SMALFitter full step ...", flush=True)
        report["config3_smalfitter_512"] = bench_fitter_step(stick, vpu_peak_gflops=vpu_peak)
    if wanted("config3b_smalfitter_512_window10"):
        print("3b/5 SMALFitter windowed (WINDOW_SIZE=10) ...", flush=True)
        report["config3b_smalfitter_512_window10"] = bench_fitter_step(
            stick, n_frames=10, vpu_peak_gflops=vpu_peak)
    if wanted("config3c_smalfitter_512_window10_worklist"):
        print("3c/5 SMALFitter windowed, work-list raster (top-800 z-nearest/tile) ...", flush=True)
        report["config3c_smalfitter_512_window10_worklist"] = bench_fitter_step(
            stick, n_frames=10, approx_max_faces=800, vpu_peak_gflops=vpu_peak)
        report["config3c_smalfitter_512_window10_worklist"]["iou_vs_exact"] = (
            measure_worklist_iou(stick, 800))
    if wanted("config3d_smalfitter_512_window10_worklist700"):
        print("3d/5 SMALFitter windowed, work-list raster (top-700) ...", flush=True)
        report["config3d_smalfitter_512_window10_worklist700"] = bench_fitter_step(
            stick, n_frames=10, approx_max_faces=700, vpu_peak_gflops=vpu_peak)
        report["config3d_smalfitter_512_window10_worklist700"]["iou_vs_exact"] = (
            measure_worklist_iou(stick, 700))
    if wanted("config4_singleview_resnet50"):
        print("4/5 single-view inference ...", flush=True)
        report["config4_singleview_resnet50"] = bench_singleview_inference(stick)
    if wanted("config4b_singleview_train_step"):
        print("4b/5 single-view train step ...", flush=True)
        report["config4b_singleview_train_step"] = bench_singleview_train_step(stick)
    if wanted("config4c_singleview_train_step_gn"):
        print("== config4c: single-view GroupNorm train step ==", flush=True)
        report["config4c_singleview_train_step_gn"] = bench_singleview_train_step(
            stick, backbone="resnet50_gn")
    if wanted("config5a_multiview_4cam_stick"):
        print("5a/5 multi-view 4-cam stick ...", flush=True)
        report["config5a_multiview_4cam_stick"] = bench_multiview_inference(stick, 4, 224, "stick4")
    if wanted("config5b_multiview_18cam_mouse"):
        print("5b/5 multi-view 18-cam mouse ...", flush=True)
        report["config5b_multiview_18cam_mouse"] = bench_multiview_inference(mouse, 18, 224, "mouse18")
    if wanted("config5c_multiview_train_step"):
        print("5c/5 multi-view train step (4-cam stick) ...", flush=True)
        report["config5c_multiview_train_step"] = bench_multiview_train_step(stick)

    out = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    if args.only is not None and os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
        merged.update(report)
        report = merged
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
