"""Frame-sharded single-sequence fitting: a ShardedSequenceFitter over a
('frames',) mesh must reproduce the single-device SmalFitter fit — per-frame
params stay local, shared-param grads psum, mean-like loss terms scale 1/D,
and the temporal boundary pairs ride a ppermute halo (fitter_frames.py)."""

import os
import subprocess
import sys


def test_frame_sharded_matches_single_device():
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from smilify_tpu.fitter.fitter import FitData, SmalFitter
from smilify_tpu.fitter.fitter_frames import ShardedSequenceFitter
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.train.multidevice import toy_model_spec

H = W = 64
N = 8
spec = toy_model_spec()
rng = np.random.RandomState(3)
data = FitData(
    rgb=None,
    sil=jnp.asarray((rng.rand(N, H, W) > 0.8).astype(np.float32)),
    joints=jnp.asarray(rng.rand(N, spec.n_joints, 2).astype(np.float32) * H),
    visibility=jnp.asarray((rng.rand(N, spec.n_joints) > 0.2).astype(np.float32)),
)
# stage 0 exercises torso-freeze; stage 1 the full loss INCLUDING the temporal
# term (w_temp>0), whose boundary pairs take the halo-exchange path
schedule = [
    StageWeights(num_iters=3, lr=1e-2, w_j2d=1.0, w_reproj=0.0, w_betas=0.0,
                 w_pose=0.0, w_limit=0.0, w_splay=0.0, w_temp=0.0),
    StageWeights(num_iters=4, lr=1e-2, w_j2d=1.0, w_reproj=0.5, w_betas=0.1,
                 w_pose=0.01, w_limit=0.01, w_splay=0.01, w_temp=0.5),
]
def run(fitter, chunk):
    traj = []
    fitter.fit(schedule=schedule, chunk=chunk,
               callback=lambda st, it, loss, objs: traj.append(float(loss)))
    return traj

single = SmalFitter(spec, data, (H, W))
single_traj = run(single, 1)

mesh = Mesh(np.asarray(jax.devices()[:4]), ("frames",))
sharded = ShardedSequenceFitter(spec, data, (H, W), mesh=mesh)
sharded_traj = run(sharded, 2)  # chunk=2 exercises the scan path too

# the semantic check: the WHOLE per-iteration loss trajectory matches
assert len(single_traj) == len(sharded_traj) == 7
np.testing.assert_allclose(single_traj, sharded_traj, rtol=1e-3, atol=1e-6)
# end-state params: fp reassociation drift noised up by Adam's
# grad-magnitude normalization — loose bound (see test_fitter_batch.py)
for a, b in zip(jax.tree.flatten(single.params)[0], jax.tree.flatten(sharded.params)[0]):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3)
print("FRAME-SHARDED-OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         timeout=1800, capture_output=True, text=True)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "FRAME-SHARDED-OK" in out.stdout


def test_halo_temporal_matches_plain():
    """temporal_losses_halo on a sharded sequence == temporal_losses on the
    full sequence, for every shard count that divides N (incl. n_local=1)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec
from smilify_tpu.fitter.fitter import FitParams, temporal_losses
from smilify_tpu.fitter.fitter_frames import temporal_losses_halo

N, J, P = 8, 6, 5
rng = np.random.RandomState(0)
params = FitParams(
    global_rot=jnp.asarray(rng.randn(N, 3).astype(np.float32)),
    joint_rot=jnp.asarray(rng.randn(N, P, 3).astype(np.float32)),
    betas=jnp.asarray(rng.randn(3).astype(np.float32)),
    trans=jnp.asarray(rng.randn(N, 3).astype(np.float32)),
    fov=jnp.full((N,), 60.0),
    log_beta_scales=jnp.zeros((J, 3)),
    joint_trans=jnp.zeros((J, 3)),
)
want = [float(v) for v in temporal_losses(params, 0.7)]
FR, RP = PartitionSpec("frames"), PartitionSpec()
specs = FitParams(global_rot=FR, joint_rot=FR, betas=RP, trans=FR, fov=FR,
                  log_beta_scales=RP, joint_trans=RP)
for D in (2, 4, 8):
    mesh = Mesh(np.asarray(jax.devices()[:D]), ("frames",))
    def body(p):
        tj, tg, tt = temporal_losses_halo(p, 0.7, "frames")
        return tuple(jax.lax.psum(v, "frames") for v in (tj, tg, tt))
    got = shard_map(body, mesh=mesh, in_specs=(specs,),
                    out_specs=(RP, RP, RP), check_vma=False)(params)
    np.testing.assert_allclose([float(v) for v in got], want, rtol=1e-5)
print("HALO-OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         timeout=900, capture_output=True, text=True)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "HALO-OK" in out.stdout
