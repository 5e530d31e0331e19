"""Multi-device (SPMD) correctness tests on 8 virtual CPU devices.

The platform/device-count cannot change after jax's backend initializes, so
each test runs in a subprocess with
``JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``.

Covers what the reference validates only implicitly through DDP
(train_multiview_regressor.py:131-253): the sharded neural train step, eval
all-reduce, gradient accumulation, and the data-parallel fitter step all
produce the single-device numbers on an 8-device mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_subprocess(code: str, n_devices: int = 8, timeout: int = 900):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO, timeout=timeout,
        capture_output=True, text=True,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    return out.stdout


def test_sharded_trainer_matches_single_device():
    """Full multi-view regressor train step + eval step on an 8-device mesh:
    loss, eval loss, and param-update norm equal the 1-device values.
    Exercises data_mesh / shard_batch / replicate / grad accumulation."""
    out = run_subprocess(
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        "from smilify_tpu.train.multidevice import run_trainer_check, toy_model_spec\n"
        "r = run_trainer_check(8, accum_steps=2, compare_single=True, spec=toy_model_spec())\n"
        "print('RESULT', r['loss'], r['eval_loss'])\n"
    )
    assert "RESULT" in out


def test_grad_accum_matches_no_accum():
    """accum_steps=2 over a batch approximates accum_steps=1 on the same batch.
    Not bit-exact: BatchNorm in the UNet backbone normalizes per microbatch
    under accumulation (exactly like the reference's DDP no_sync path), so the
    tolerance is loose-but-tight-enough to catch a broken mean (observed
    relative difference ~6e-3 on the toy model; a mis-scaled accumulation
    would be ~2x)."""
    out = run_subprocess(
        "import jax, numpy as np\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "from smilify_tpu.train.multidevice import run_trainer_check, toy_model_spec\n"
        "spec = toy_model_spec()\n"
        "a = run_trainer_check(4, batch_size=8, accum_steps=2, compare_single=False, spec=spec)\n"
        "b = run_trainer_check(4, batch_size=8, accum_steps=1, compare_single=False, spec=spec)\n"
        "np.testing.assert_allclose(a['loss'], b['loss'], rtol=5e-3)\n"
        "np.testing.assert_allclose(a['update_norm'], b['update_norm'], rtol=2e-2)\n"
        "print('ACCUM OK')\n"
    )
    assert "ACCUM OK" in out


@pytest.mark.smoke
def test_shard_batch_layout():
    """shard_batch shards the leading axis over the mesh and replicates
    scalars; replicate() fully replicates a pytree."""
    out = run_subprocess(
        "import jax, numpy as np\n"
        "from jax.sharding import PartitionSpec as P\n"
        "from smilify_tpu.train.trainer import data_mesh, replicate, shard_batch\n"
        "mesh = data_mesh(8)\n"
        "batch = {'x': np.zeros((16, 3, 5)), 'y': np.zeros((16,)), 's': np.float32(2.0)}\n"
        "out = shard_batch(mesh, batch)\n"
        "assert out['x'].sharding.spec == P('data', None, None), out['x'].sharding\n"
        "assert len(out['x'].sharding.device_set) == 8\n"
        "assert out['y'].sharding.spec == P('data')\n"
        "params = replicate(mesh, {'w': np.ones((4, 4))})\n"
        "assert params['w'].sharding.is_fully_replicated\n"
        "print('LAYOUT OK')\n"
    )
    assert "LAYOUT OK" in out


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    """The driver-facing dryrun (fitter + neural trainer) passes on 8 virtual
    devices end-to-end."""
    out = run_subprocess(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n",
        timeout=1800,
    )
    assert "OK" in out


def test_quick_pck_helper():
    """Training-time PCK@5 signal: 1.0 at consistent GT, 0.0 when shifted."""
    code = (
        "import numpy as np, jax.numpy as jnp, jax\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "from smilify_tpu.train.multidevice import toy_model_spec\n"
        "from smilify_tpu.train.train_viz import _body_forward, _quick_pck\n"
        "from smilify_tpu.render.cameras import default_camera\n"
        "spec = toy_model_spec()\n"
        "cam = default_camera()\n"
        "preds = {'global_rot': jnp.zeros((2, 3)),\n"
        "         'joint_rot': jnp.zeros((2, spec.n_joints - 1, 3)),\n"
        "         'betas': jnp.zeros((2, spec.n_betas)), 'trans': jnp.zeros((2, 3)),\n"
        "         'fov': jnp.full((2,), 60.0),\n"
        "         'cam_rot': jnp.tile(cam.R[None], (2, 1, 1)),\n"
        "         'cam_trans': jnp.tile(cam.T[None], (2, 1))}\n"
        "_, joints = _body_forward(spec, preds, 0)\n"
        "yx = np.asarray(cam.project_points_yx(joints, (64, 64)))\n"
        "batch = {'keypoints_2d': np.tile(yx[None, :, ::-1], (2, 1, 1)),\n"
        "         'keypoint_visibility': np.ones((2, spec.n_joints))}\n"
        "assert _quick_pck(spec, preds, batch, (64, 64), multiview=False) == 1.0\n"
        "batch['keypoints_2d'] = batch['keypoints_2d'] + 20.0\n"
        "assert _quick_pck(spec, preds, batch, (64, 64), multiview=False) == 0.0\n"
        "print('PCK OK')\n"
    )
    out = run_subprocess(code, n_devices=1)
    assert "PCK OK" in out


def test_epoch_visualization_outputs(tmp_path):
    """render_epoch_collages + plot_3d_keypoints + IEF metrics produce files
    from one decoded batch (the per-epoch observability path both trainers
    call; reference train_multiview_regressor.py:820-1722)."""
    code = (
        "import numpy as np, jax, jax.numpy as jnp, os, sys\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "from smilify_tpu.train.multidevice import toy_model_spec\n"
        "from smilify_tpu.train.train_viz import epoch_visualization\n"
        "from smilify_tpu.render.cameras import default_camera\n"
        "spec = toy_model_spec()\n"
        "cam = default_camera()\n"
        "out_root = sys.argv[1]\n"
        "B, K = 2, spec.n_joints\n"
        "preds = {'global_rot': jnp.zeros((B, 3)),\n"
        "         'joint_rot': jnp.zeros((B, spec.n_joints - 1, 3)),\n"
        "         'betas': jnp.zeros((B, spec.n_betas)), 'trans': jnp.zeros((B, 3)),\n"
        "         'fov': jnp.full((B,), 60.0),\n"
        "         'cam_rot': jnp.tile(cam.R[None], (B, 1, 1)),\n"
        "         'cam_trans': jnp.tile(cam.T[None], (B, 1)),\n"
        "         'ief_history': [jnp.zeros((B, 8)), jnp.ones((B, 8))]}\n"
        "batch = {'image': np.random.RandomState(0).rand(B, 48, 48, 3).astype(np.float32),\n"
        "         'keypoints_2d': np.full((B, K, 2), 24.0, np.float32),\n"
        "         'keypoint_visibility': np.ones((B, K), np.float32),\n"
        "         'keypoints_3d': np.zeros((B, K, 3), np.float32)}\n"
        "def apply_fn(variables, b, train):\n"
        "    return preds, None\n"
        "m = epoch_visualization(spec, apply_fn, {}, {}, batch, (48, 48),\n"
        "                        out_root, epoch=3, multiview=False, max_samples=2)\n"
        "viz = os.path.join(out_root, 'visualizations')\n"
        "assert os.path.exists(os.path.join(viz, 'epoch0003_sample0.png'))\n"
        "assert os.path.exists(os.path.join(viz, 'epoch0003_kp3d.png'))\n"
        "assert 'ief_delta_iter1' in m and m['ief_delta_iter1'] > 0\n"
        "assert 'ief_val_pck5' in m\n"
        "print('VIZ OK')\n"
    )
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    out = subprocess.run([sys.executable, "-c", code, str(tmp_path)], env=env,
                         cwd=REPO, timeout=600, capture_output=True, text=True)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "VIZ OK" in out.stdout


def test_shard_batch_multihost_process_local_path():
    """Under a multi-process runtime, shard_batch must assemble the global
    batch from per-process LOCAL slices (make_array_from_process_local_data).
    A plain device_put would treat every host's distinct local batch as the
    same global value — half of every host's samples silently dropped at two
    hosts. Single-process runs with a mocked process_count: the process-local
    assembly path must be taken for arrays and produce the same values."""
    out = run_subprocess(
        "import numpy as np\n"
        "import jax\n"
        "from smilify_tpu.train import trainer\n"
        "mesh = trainer.data_mesh()\n"
        "calls = []\n"
        "real = jax.make_array_from_process_local_data\n"
        "def recording(sharding, arr, *a, **kw):\n"
        "    calls.append(np.asarray(arr).shape)\n"
        "    return real(sharding, arr, *a, **kw)\n"
        "jax.process_count = lambda: 2\n"
        "jax.make_array_from_process_local_data = recording\n"
        "batch = {'x': np.arange(48, dtype=np.float32).reshape(16, 3),\n"
        "         's': np.float32(7.0)}\n"
        "out = trainer.shard_batch(mesh, batch)\n"
        "assert calls == [(16, 3)], calls  # arrays take the process-local path\n"
        "np.testing.assert_array_equal(np.asarray(out['x']), batch['x'])\n"
        "assert float(out['s']) == 7.0  # scalars stay replicated device_put\n"
        "print('SHARD-BATCH OK')\n"
    )
    assert "SHARD-BATCH OK" in out


def test_sharded_inference_cli_matches_single_device():
    """`run_inference --shard` on an 8-device mesh reproduces the unsharded
    trajectory exactly, including the padded ragged final batch (5 frames,
    batch 4 → batches of 4 and 1, both padded to the mesh size). The
    reference needs a 2-phase DDP pipeline with pickled temp predictions for
    this (run_multiview_inference.py:664-930)."""
    out = run_subprocess(
        "import jax, numpy as np, pathlib, tempfile\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        "from tests.test_serving_export import _make_checkpoint\n"
        "tmp = pathlib.Path(tempfile.mkdtemp())\n"
        "ckpt = _make_checkpoint(tmp, 'single_view')\n"
        "from smilify_tpu.cli.run_inference import main\n"
        "TEX = '/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX'\n"
        "a1, a2 = str(tmp / 'plain.npz'), str(tmp / 'shard.npz')\n"
        "common = ['--checkpoint', ckpt, '--data-path', TEX,\n"
        "          '--max-frames', '5', '--batch-size', '4']\n"
        "main(common + ['--export-animation', a1])\n"
        "main(common + ['--export-animation', a2, '--shard'])\n"
        "d1, d2 = np.load(a1), np.load(a2)\n"
        "for k in ('poses', 'trans', 'betas'):\n"
        "    np.testing.assert_allclose(d1[k], d2[k], atol=2e-5, rtol=1e-5, err_msg=k)\n"
        "print('SHARDED-INFERENCE-OK')\n",
        timeout=1200,
    )
    assert "SHARDED-INFERENCE-OK" in out


def test_sharded_serving_artifact():
    """AOT serving artifact exported SPMD-partitioned over an 8-device
    ('data',) mesh: deserialize + call reproduces the live model exactly.
    No reference analogue (multi-GPU serving there means redeploying the DDP
    inference script)."""
    out = run_subprocess(
        "import jax, numpy as np, pathlib, tempfile\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        "from tests.test_serving_export import _make_checkpoint, _inputs\n"
        "tmp = pathlib.Path(tempfile.mkdtemp())\n"
        "ckpt = _make_checkpoint(tmp, 'single_view')\n"
        "from smilify_tpu.serve import (build_predict_fn,\n"
        "    export_serving_artifact, load_serving_artifact)\n"
        "out = str(tmp / 'sharded.jaxexport')\n"
        "meta = export_serving_artifact(ckpt, out, batch_size=16,\n"
        "                               platforms=('cpu',), shard_data=True)\n"
        "assert meta['data_sharded'] and meta['n_devices'] == 8, meta\n"
        "served_model = load_serving_artifact(out)\n"
        "inputs = _inputs('single_view', 16)\n"
        "served = served_model(*inputs)\n"
        "from smilify_tpu.cli.run_inference import load_model_from_checkpoint\n"
        "model, cfg, rcfg, spec, params, bs, _ = load_model_from_checkpoint(ckpt)\n"
        "live = build_predict_fn(model, rcfg, spec, params, bs, False)(*inputs)\n"
        "for k in live:\n"
        "    np.testing.assert_allclose(np.asarray(served[k], np.float32),\n"
        "                               np.asarray(live[k], np.float32),\n"
        "                               rtol=0, atol=2e-5, err_msg=k)\n"
        "print('SHARDED-SERVING-OK', served['global_rot'].shape)\n",
        timeout=1200,
    )
    assert "SHARDED-SERVING-OK" in out


def test_device_data_cache_matches_host_pipeline():
    """DeviceDataCache on an 8-device mesh: columns replicated, gathered
    batches sharded on the data axis, values matching the host pipeline's
    np.stack batches (uint8 image round-trip is exact up to one f32 ulp of
    the x/255 division for JPEG-decoded [0,1] data)."""
    run_subprocess(
        "import numpy as np\n"
        "import jax, jax.numpy as jnp\n"
        "from smilify_tpu.train.trainer import DeviceDataCache, data_mesh\n"
        "rng = np.random.RandomState(0)\n"
        "class DS:\n"
        "    def __len__(self): return 16\n"
        "    def __getitem__(self, i):\n"
        "        r = np.random.RandomState(i)\n"
        "        return {'image': (r.randint(0, 256, (8, 8, 3)) / 255.0).astype(np.float32),\n"
        "                'betas': r.randn(5).astype(np.float32),\n"
        "                'view_mask': np.ones(2, bool),\n"
        "                'session_name': 'synthetic'}\n"
        "ds = DS()\n"
        "mesh = data_mesh(8)\n"
        "cache = DeviceDataCache(ds, mesh)\n"
        "assert 'session_name' not in cache.arrays\n"
        "idx = np.arange(8)\n"
        "b = cache.batch(idx)\n"
        "want_img = np.stack([ds[i]['image'] for i in idx])\n"
        "np.testing.assert_allclose(np.asarray(b['image']), want_img, atol=1e-7)\n"
        "np.testing.assert_array_equal(np.asarray(b['betas']),\n"
        "                              np.stack([ds[i]['betas'] for i in idx]))\n"
        "assert b['view_mask'].dtype == jnp.bool_\n"
        "shard_axes = b['image'].sharding.spec\n"
        "assert shard_axes[0] == 'data', shard_axes\n"
        "g = np.random.default_rng(0)\n"
        "batches = list(cache.iterate(8, g, shuffle=True))\n"
        "assert len(batches) == 2\n"
        "print('DEVICE-CACHE-OK')\n"
    )
