"""Breakdown of the config3 bench step (single frame, 512^2, exact raster)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax, jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from smilify_tpu.core.spec import load_model_spec
from smilify_tpu.fitter.fitter import FitData, forward_losses, init_params, temporal_losses
from smilify_tpu.fitter.priors import (
    default_limit_prior, default_pose_prior, shape_prior_from_spec)
from smilify_tpu.fitter.stages import OPT_WEIGHTS

spec = load_model_spec("/root/reference/3D_model_prep/SMILy_STICK.pkl", align_symmetry=False)
sp = shape_prior_from_spec(spec)
pp = default_pose_prior(spec)
lp = default_limit_prior(spec)
N = 1
IMAGE_SIZE = (512, 512)
params = init_params(spec, N, sp)
rng = np.random.RandomState(0)
H, W = IMAGE_SIZE
data = FitData(
    rgb=None,
    sil=jnp.asarray((rng.rand(N, H, W) > 0.7).astype(np.float32)),
    joints=jnp.asarray(rng.rand(N, spec.n_joints, 2).astype(np.float32) * H),
    visibility=jnp.ones((N, spec.n_joints)),
)
weights = OPT_WEIGHTS[1]
tx = optax.adam(weights.lr, b1=0.5)


def timeit(name, fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt


def make_step(w, amf=None):
    def loss_fn(p):
        total, _ = forward_losses(spec, p, data, w, pp, lp, sp, IMAGE_SIZE,
                                  approx_max_faces=amf)
        tj, tg, tt = temporal_losses(p, w.w_temp)
        return total + tj + tg + tt
    opt_state = tx.init(params)
    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss
    return step, opt_state


# 1. full exact step
step, s0 = make_step(weights)
t_full = timeit("full step (exact)", lambda: step(params, s0))

# 2. no-silhouette step
w_nosil = weights._replace(w_reproj=0.0)
step2, s2 = make_step(w_nosil)
t_nosil = timeit("step w/o silhouette", lambda: step2(params, s2))

# 3. worklist variants
for cap in (800, 700, 400, 200):
    stepw, sw = make_step(weights, amf=cap)
    timeit(f"full step (worklist cap {cap})", lambda: stepw(params, sw))

# 4. raster fwd only / fwd+bwd
from smilify_tpu.render.rasterizer import soft_silhouette
from smilify_tpu.render.cameras import default_camera
from smilify_tpu.core.lbs import smil_forward

out = smil_forward(spec, jnp.broadcast_to(params.betas, (N, params.betas.shape[0])),
                   jnp.concatenate([params.global_rot[:, None, :], params.joint_rot], axis=1))
verts = out.verts + params.trans[:, None, :]
cam = default_camera()
pts_view = jax.vmap(cam.world_to_view)(verts)
ndc = jax.vmap(cam.view_to_ndc)(pts_view)
verts_ndc = jnp.concatenate([ndc[..., :2], pts_view[..., 2:3]], axis=-1)
verts_ndc = jax.block_until_ready(verts_ndc)

fwd = jax.jit(lambda v: soft_silhouette(v, spec.faces, IMAGE_SIZE, znear=cam.znear))
timeit("raster fwd only (exact)", lambda: fwd(verts_ndc))

g = jax.jit(jax.grad(lambda v: jnp.sum(soft_silhouette(v, spec.faces, IMAGE_SIZE, znear=cam.znear) ** 2)))
timeit("raster fwd+bwd (exact)", lambda: g(verts_ndc))

for cap in (800, 400):
    fw = jax.jit(lambda v, c=cap: soft_silhouette(v, spec.faces, IMAGE_SIZE, znear=cam.znear, approx_max_faces=c))
    timeit(f"raster fwd only (worklist {cap})", lambda: fw(verts_ndc))
    gw = jax.jit(jax.grad(lambda v, c=cap: jnp.sum(soft_silhouette(v, spec.faces, IMAGE_SIZE, znear=cam.znear, approx_max_faces=c) ** 2)))
    timeit(f"raster fwd+bwd (worklist {cap})", lambda: gw(verts_ndc))

# 5. scan-chained steps (K iters per dispatch) — amortizes tunnel dispatch
def make_chain(w, K, amf=None):
    def loss_fn(p):
        total, _ = forward_losses(spec, p, data, w, pp, lp, sp, IMAGE_SIZE,
                                  approx_max_faces=amf)
        tj, tg, tt = temporal_losses(p, w.w_temp)
        return total + tj + tg + tt
    opt_state = tx.init(params)
    @jax.jit
    def chain(p, s):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss
        (p, s), losses = jax.lax.scan(body, (p, s), None, length=K)
        return p, s, losses
    return chain, opt_state

for K in (5, 10):
    ch, sc = make_chain(weights, K)
    t = timeit(f"chained x{K} (exact), per-iter", lambda: ch(params, sc), iters=10)
    print(f"    -> {t/K*1e3:.3f} ms/iter = {K/t:.1f} it/s")

ch, sc = make_chain(weights, 10, amf=700)
t = timeit("chained x10 (worklist 700), per-iter", lambda: ch(params, sc), iters=10)
print(f"    -> {t/10*1e3:.3f} ms/iter = {10/t:.1f} it/s")

# 6. LBS decomposition
th = jnp.concatenate([params.global_rot[:, None, :], params.joint_rot], axis=1)
bt = jnp.broadcast_to(params.betas, (N, params.betas.shape[0]))
lbs_fwd = jax.jit(lambda b, t: smil_forward(spec, b, t).verts.sum())
timeit("LBS fwd only", lambda: lbs_fwd(bt, th))
lbs_g = jax.jit(jax.grad(lambda t: smil_forward(spec, bt, t).verts.sum()))
timeit("LBS fwd+bwd", lambda: lbs_g(th))

print("done")
