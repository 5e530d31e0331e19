"""REAL multi-process multihost execution — no mocks.

Launches an actual 2-process jax.distributed CPU cluster
(``jax.distributed.initialize("127.0.0.1:<port>", num_processes=2,
process_id=i)`` in two subprocesses, 4 virtual devices each → one 8-device
global mesh) and runs the same code paths the mocked tests in
test_multidevice.py could only approximate:

  * the sharded multi-view train step through ``shard_batch``'s
    process-local-assembly path (each host feeds its local half of the
    global batch via ``make_array_from_process_local_data``);
  * a frame-sharded fit through ``ShardedFitterMixin._globalize_inputs``
    (``multihost.globalize``) and the final ``multihost.allgather``.

Parity oracle: the same worker run single-process on an 8-local-device mesh —
identical global sharding layout, so losses must agree to fp-noise. The
reference's equivalent machinery runs multi-process in production
(train_multiview_regressor.py:131-253,3134-3172); it has no cluster-less test
for it at all.

Environment note: the axon TPU plugin registers itself via sitecustomize
whenever PALLAS_AXON_POOL_IPS is set and then *hijacks platform selection
under jax.distributed* (JAX_PLATFORM_NAME=cpu is ignored once the plugin is
live) — the cluster env scrubs it so the workers run pure-CPU.
"""

import os
import re
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREAMBLE = """
import os, sys
import numpy as np

pid, port, nprocs = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if nprocs > 1:
    # cross-process CPU collectives need the gloo transport
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
assert jax.device_count() == 8, jax.devices()
"""

EPILOGUE = """
if nprocs > 1:
    jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(body: str, n_procs: int, timeout: int = 900):
    """Run PREAMBLE+body in n_procs coordinated processes; return proc-0 stdout."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disarm the axon sitecustomize hook
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    env["PYTHONPATH"] = REPO  # worker file lives in /tmp; import the package

    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // n_procs}"
    )
    port = _free_port()
    with tempfile.NamedTemporaryFile("w", suffix="_mh_worker.py", delete=False) as f:
        f.write(PREAMBLE + body + EPILOGUE)
        worker = f.name
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(port), str(n_procs)],
                env=env, cwd=REPO, text=True,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
            for i in range(n_procs)
        ]
        outs = [p.communicate(timeout=timeout) for p in procs]
        for i, (p, (so, se)) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, (
                f"proc {i}/{n_procs} rc={p.returncode}\nstdout:\n{so}\nstderr:\n{se}"
            )
        return outs[0][0]
    finally:
        os.unlink(worker)


def _parse(out: str, tag: str):
    m = re.search(rf"^{tag} (.+)$", out, re.M)
    assert m, f"no '{tag}' line in:\n{out}"
    return [float(x) for x in m.group(1).split()]


TRAIN_BODY = """
from smilify_tpu.train.multidevice import (
    _build_setup, synthetic_multiview_batch, toy_model_spec)
from smilify_tpu.train.trainer import data_mesh, replicate, shard_batch

spec = toy_model_spec()
res, n_views, B = 32, 2, 8
variables, tx, train_step, eval_step = _build_setup(spec, n_views, res, 2)
batch_np = synthetic_multiview_batch(spec, B, n_views, res)

mesh = data_mesh()  # all 8 GLOBAL devices
params = replicate(mesh, variables["params"])
stats = replicate(mesh, variables.get("batch_stats", {}))
opt_state = replicate(mesh, tx.init(variables["params"]))

if nprocs > 1:
    # each host feeds its process-local slice of the global batch — the
    # make_array_from_process_local_data path inside shard_batch
    lo, hi = pid * B // nprocs, (pid + 1) * B // nprocs
    local = {k: (np.asarray(v)[lo:hi] if np.asarray(v).ndim else v)
             for k, v in batch_np.items()}
    batch = shard_batch(mesh, local)
    assert not batch["images"].is_fully_addressable
else:
    batch = shard_batch(mesh, batch_np)

new_params, new_stats, opt_state, loss, objs = train_step(
    params, stats, opt_state, batch)
eval_loss, _ = eval_step(params, stats, batch)

import optax
from smilify_tpu.train.multihost import allgather

upd = optax.global_norm(jax.tree.map(lambda a, b: a - b, new_params, params))
vals = allgather({"loss": loss, "eval": eval_loss, "upd": upd})
print("TRAIN", float(np.ravel(vals["loss"])[0]),
      float(np.ravel(vals["eval"])[0]), float(np.ravel(vals["upd"])[0]),
      flush=True)
"""

FIT_BODY = """
import jax.numpy as jnp
from jax.sharding import Mesh
from smilify_tpu.fitter.fitter import FitData, SmalFitter
from smilify_tpu.fitter.fitter_frames import ShardedSequenceFitter
from smilify_tpu.fitter.stages import StageWeights
from smilify_tpu.train.multidevice import toy_model_spec
from smilify_tpu.train.multihost import allgather, is_primary

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
schedule = [
    StageWeights(num_iters=3, lr=1e-2, w_j2d=1.0, w_reproj=0.0, w_betas=0.0,
                 w_pose=0.0, w_limit=0.0, w_splay=0.0, w_temp=0.0),
    StageWeights(num_iters=3, lr=1e-2, w_j2d=1.0, w_reproj=0.5, w_betas=0.1,
                 w_pose=0.01, w_limit=0.01, w_splay=0.01, w_temp=0.5),
]
mesh = Mesh(np.asarray(jax.devices()), ("frames",))  # 8 global devices
fitter = ShardedSequenceFitter(spec, data, (H, W), mesh=mesh)
if nprocs > 1:
    # _globalize_inputs really took the multi-process path
    assert not fitter.params.trans.is_fully_addressable

traj = []
fitter.fit(schedule=schedule, chunk=2,
           callback=lambda st, it, loss, objs: traj.append(float(loss)))

params_h = allgather(fitter.params)  # collective: every process joins
leaves = jax.tree.leaves(params_h)
assert all(np.asarray(x).shape == y.shape
           for x, y in zip(leaves, jax.tree.leaves(fitter.params)))
digest = [float(np.sum(np.asarray(x))) for x in leaves]
print("ISPRIMARY", int(is_primary()), flush=True)
print("FIT", " ".join(f"{v:.9g}" for v in traj + digest), flush=True)
"""


def test_real_two_process_train_step_matches_single_process():
    """One sharded multi-view train step on a real 2-process cluster equals
    the single-process 8-device run (identical global sharding layout)."""
    import numpy as np

    out2 = run_cluster(TRAIN_BODY, n_procs=2)
    out1 = run_cluster(TRAIN_BODY, n_procs=1)
    v2, v1 = _parse(out2, "TRAIN"), _parse(out1, "TRAIN")
    np.testing.assert_allclose(v2, v1, rtol=2e-5, err_msg="loss/eval/upd")


def test_real_two_process_frame_sharded_fit_matches_single_process():
    """A short frame-sharded fit (globalize → shard_map w/ psum + ppermute
    halo → allgather) on a real 2-process cluster reproduces the
    single-process loss trajectory and final parameters."""
    import numpy as np

    out2 = run_cluster(FIT_BODY, n_procs=2)
    out1 = run_cluster(FIT_BODY, n_procs=1)
    assert _parse(out2, "ISPRIMARY") == [1.0]  # proc 0 is the writer
    v2, v1 = _parse(out2, "FIT"), _parse(out1, "FIT")
    np.testing.assert_allclose(v2[:6], v1[:6], rtol=1e-3, atol=1e-6,
                               err_msg="loss trajectory")
    np.testing.assert_allclose(v2[6:], v1[6:], rtol=3e-3, atol=3e-3,
                               err_msg="final param digests")
