"""Sequence-batched fitting: a BatchedFitter run over S stacked clips must be
EXACTLY S independent SmalFitter runs (same schedule, same trajectories) —
no parameter is shared across sequences and every loss term keeps its
per-sequence normalization, so the summed loss yields identical per-sequence
gradients (fitter_batch.py docstring)."""

import numpy as np
import jax
import jax.numpy as jnp

from smilify_tpu.fitter.fitter import FitData, SmalFitter
from smilify_tpu.fitter.fitter_batch import BatchedFitter
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.train.multidevice import toy_model_spec

H = W = 64
N = 2  # frames per clip
S = 3  # clips


def _seq_data(spec, seed):
    rng = np.random.RandomState(seed)
    return FitData(
        rgb=None,
        sil=jnp.asarray((rng.rand(N, H, W) > 0.8).astype(np.float32)),
        joints=jnp.asarray(rng.rand(N, spec.n_joints, 2).astype(np.float32) * H),
        visibility=jnp.asarray((rng.rand(N, spec.n_joints) > 0.2).astype(np.float32)),
    )


def _stack(datas):
    return FitData(
        rgb=None,
        sil=jnp.stack([d.sil for d in datas]),
        joints=jnp.stack([d.joints for d in datas]),
        visibility=jnp.stack([d.visibility for d in datas]),
    )


def _schedule():
    # stage 0 exercises the torso-only freeze path; stage 1 the full loss
    return [
        StageWeights(num_iters=3, lr=1e-2, w_j2d=1.0, w_reproj=0.0, w_betas=0.0,
                     w_pose=0.0, w_limit=0.0, w_splay=0.0, w_temp=0.0),
        StageWeights(num_iters=4, lr=1e-2, w_j2d=1.0, w_reproj=0.5, w_betas=0.1,
                     w_pose=0.01, w_limit=0.01, w_splay=0.01, w_temp=0.1),
    ]


def test_batched_matches_independent_fits():
    spec = toy_model_spec()
    datas = [_seq_data(spec, seed) for seed in (0, 1, 2)]

    batched = BatchedFitter(spec, _stack(datas), (H, W))
    batched.fit(schedule=_schedule())

    for s, data in enumerate(datas):
        single = SmalFitter(spec, data, (H, W))
        single.fit(schedule=_schedule())
        got = jax.tree.flatten(batched.sequence_params(s))[0]
        want = jax.tree.flatten(single.params)[0]
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)


def test_batched_chunked_matches_single_steps():
    """The inherited chunk=K lax.scan stepping works on batched shapes."""
    spec = toy_model_spec()
    data = _stack([_seq_data(spec, seed) for seed in (5, 6, 7)])
    results = {}
    for chunk in (1, 3):  # 4 iters at chunk 3 → chained 3 + remainder 1
        fitter = BatchedFitter(spec, data, (H, W))
        fitter.run_stage(1, _schedule()[1], chunk=chunk)
        results[chunk] = fitter.params
    for a, b in zip(jax.tree.flatten(results[1])[0], jax.tree.flatten(results[3])[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_sharded_corpus_matches_unsharded():
    """ShardedBatchedFitter on a 4-device ('clips',) mesh must reproduce the
    single-device BatchedFitter numbers — clips are embarrassingly parallel,
    so the shard_map step has no collectives in the optimization (only the
    psum on the reported loss). Subprocess: the platform/device count cannot
    change after backend init (test_multidevice.py pattern)."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from smilify_tpu.fitter.fitter import FitData
from smilify_tpu.fitter.fitter_batch import BatchedFitter, ShardedBatchedFitter
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.train.multidevice import toy_model_spec

H = W = 64
N, S = 2, 4
spec = toy_model_spec()
rng = np.random.RandomState(0)
data = FitData(
    rgb=None,
    sil=jnp.asarray((rng.rand(S, N, H, W) > 0.8).astype(np.float32)),
    joints=jnp.asarray(rng.rand(S, N, spec.n_joints, 2).astype(np.float32) * H),
    visibility=jnp.asarray((rng.rand(S, N, spec.n_joints) > 0.2).astype(np.float32)),
)
schedule = [
    StageWeights(num_iters=3, lr=1e-2, w_j2d=1.0, w_reproj=0.0, w_betas=0.0,
                 w_pose=0.0, w_limit=0.0, w_splay=0.0, w_temp=0.0),
    StageWeights(num_iters=4, lr=1e-2, w_j2d=1.0, w_reproj=0.5, w_betas=0.1,
                 w_pose=0.01, w_limit=0.01, w_splay=0.01, w_temp=0.1),
]
plain = BatchedFitter(spec, data, (H, W))
plain_losses = plain.fit(schedule=schedule)

mesh = Mesh(np.asarray(jax.devices()[:4]), ("clips",))
sharded = ShardedBatchedFitter(spec, data, (H, W), mesh=mesh)
sharded_losses = sharded.fit(schedule=schedule, chunk=2)  # exercises the scan path

for a, b in zip(plain_losses, sharded_losses):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
# params: sharding changes XLA fusion/tiling, so per-element fp reassociation
# drifts ~1e-3 over the 7 Adam iterations (semantically identical — the loss
# check above and the single-vs-batched test pin the exact semantics)
for a, b in zip(jax.tree.flatten(plain.params)[0], jax.tree.flatten(sharded.params)[0]):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-3)
print("SHARDED-CORPUS-OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         timeout=1200, capture_output=True, text=True)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "SHARDED-CORPUS-OK" in out.stdout


def test_batched_shapes_and_export():
    spec = toy_model_spec()
    data = _stack([_seq_data(spec, seed) for seed in (8, 9, 10)])
    fitter = BatchedFitter(spec, data, (H, W))
    assert fitter.n_seqs == S and fitter.n_frames == N
    verts, joints = fitter.forward_frames()
    assert verts.shape[:2] == (S, N) and joints.shape == (S, N, spec.n_joints, 3)
    p0 = fitter.sequence_params(0)
    assert p0.global_rot.shape == (N, 3)
    assert p0.betas.shape == fitter.params.betas.shape[1:]


def test_grid_sharded_matches_unsharded():
    """GridShardedFitter on a 2x2 ('clips','frames') mesh reproduces the
    single-device BatchedFitter numbers: clips axis collective-free, frames
    axis psums shared-param grads and halos the temporal boundary pairs."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh
from smilify_tpu.fitter.fitter import FitData
from smilify_tpu.fitter.fitter_batch import BatchedFitter, GridShardedFitter
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.train.multidevice import toy_model_spec

H = W = 64
S, N = 2, 4
spec = toy_model_spec()
rng = np.random.RandomState(7)
data = FitData(
    rgb=None,
    sil=jnp.asarray((rng.rand(S, N, H, W) > 0.8).astype(np.float32)),
    joints=jnp.asarray(rng.rand(S, N, spec.n_joints, 2).astype(np.float32) * H),
    visibility=jnp.asarray((rng.rand(S, N, spec.n_joints) > 0.2).astype(np.float32)),
)
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

plain = BatchedFitter(spec, data, (H, W))
plain_traj = run(plain, 1)

mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("clips", "frames"))
grid = GridShardedFitter(spec, data, (H, W), mesh=mesh)
grid_traj = run(grid, 2)

assert len(plain_traj) == len(grid_traj) == 7
np.testing.assert_allclose(plain_traj, grid_traj, rtol=1e-3, atol=1e-6)
for a, b in zip(jax.tree.flatten(plain.params)[0], jax.tree.flatten(grid.params)[0]):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3)
print("GRID-SHARDED-OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                         timeout=1800, capture_output=True, text=True)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "GRID-SHARDED-OK" in out.stdout
