"""Breakdown of the config3 bench step (single frame, 512^2, exact raster).

All timings via tools/_timing.timeit_chain (dependent chains + value-fetch
slope; see that module for why weaker loops mis-measure on this box)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax, jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from _timing import timeit_chain

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


def bench(name, chain, state, n1=8, n2=32, per=1):
    dt = timeit_chain(chain, state, n1=n1, n2=n2) / per
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def make_step(w, amf=None):
    def loss_fn(p):
        total, _ = forward_losses(spec, p, data, w, pp, lp, sp, IMAGE_SIZE,
                                  approx_max_faces=amf)
        tj, tg, tt = temporal_losses(p, w.w_temp)
        return total + tj + tg + tt

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    def chain(state):
        p, s = state
        p, s, _ = step(p, s)
        return p, s

    return chain


# 1. full exact step / no-silhouette / worklist variants
bench("full step (exact)", make_step(weights), (params, tx.init(params)))
bench("step w/o silhouette", make_step(weights._replace(w_reproj=0.0)),
      (params, tx.init(params)))
for cap in (800, 700, 400, 200):
    bench(f"full step (worklist cap {cap})", make_step(weights, amf=cap),
          (params, tx.init(params)))

# 2. raster fwd only / fwd+bwd
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


def raster_chains(amf=None):
    @jax.jit
    def fwd_chain(v):
        sil = soft_silhouette(v, spec.faces, IMAGE_SIZE, znear=cam.znear,
                              approx_max_faces=amf)
        return v * (1.0 - 1e-5) + jnp.mean(sil) * 1e-7

    @jax.jit
    def bwd_chain(v):
        g = jax.grad(lambda vv: jnp.sum(
            soft_silhouette(vv, spec.faces, IMAGE_SIZE, znear=cam.znear,
                            approx_max_faces=amf) ** 2))(v)
        return v * (1.0 - 1e-5) + g * 1e-7

    return fwd_chain, bwd_chain


fc, bc = raster_chains()
bench("raster fwd only (exact)", fc, verts_ndc)
bench("raster fwd+bwd (exact)", bc, verts_ndc)
for cap in (800, 400):
    fc, bc = raster_chains(cap)
    bench(f"raster fwd only (worklist {cap})", fc, verts_ndc)
    bench(f"raster fwd+bwd (worklist {cap})", bc, verts_ndc)


# 3. scan-chained steps (K iters per dispatch) — amortizes tunnel dispatch
def make_chain(w, K, amf=None):
    def loss_fn(p):
        total, _ = forward_losses(spec, p, data, w, pp, lp, sp, IMAGE_SIZE,
                                  approx_max_faces=amf)
        tj, tg, tt = temporal_losses(p, w.w_temp)
        return total + tj + tg + tt

    @jax.jit
    def scan_step(p, s):
        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), None, length=K)
        return p, s, losses

    def chain(state):
        p, s = state
        p, s, _ = scan_step(p, s)
        return p, s

    return chain


for K in (5, 10):
    dt = bench(f"chained x{K} (exact), per-iter",
               make_chain(weights, K), (params, tx.init(params)),
               n1=2, n2=6, per=K)
    print(f"    -> {1/dt:.1f} it/s")
dt = bench("chained x10 (worklist 700), per-iter",
           make_chain(weights, 10, amf=700), (params, tx.init(params)),
           n1=2, n2=6, per=10)
print(f"    -> {1/dt:.1f} it/s")

# 4. LBS decomposition
th = jnp.concatenate([params.global_rot[:, None, :], params.joint_rot], axis=1)
bt = jnp.broadcast_to(params.betas, (N, params.betas.shape[0]))


@jax.jit
def lbs_fwd_chain(b):
    return b * (1.0 - 1e-5) + smil_forward(spec, b, th).verts.sum() * 1e-9


@jax.jit
def lbs_bwd_chain(t):
    g = jax.grad(lambda tt: smil_forward(spec, bt, tt).verts.sum())(t)
    return t * (1.0 - 1e-5) + g * 1e-7


bench("LBS fwd only", lbs_fwd_chain, bt, n1=16, n2=64)
bench("LBS fwd+bwd", lbs_bwd_chain, th, n1=16, n2=64)

print("done")
