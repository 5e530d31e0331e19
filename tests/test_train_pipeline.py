"""End-to-end training-pipeline integration tests (the reference's
tests/test_pipeline.py pattern: real pipelines, tiny iteration counts,
bundled/synthetic mini-datasets)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import REPO, STICK_PKL

TEX_DATA = "/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX"


def run_module(module, args, timeout=3000):
    env = dict(os.environ)
    env.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")
    return subprocess.run(
        [sys.executable, "-u", "-m", module] + args,
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_singleview_training_pipeline(tmp_path):
    """2 epochs of real training on the bundled 20-image replicAnt data."""
    res = run_module("smilify_tpu.cli.train_regressor", [
        "--model", STICK_PKL,
        "--data-path", TEX_DATA,
        "--epochs", "2",
        "--output-dir", str(tmp_path),
        "--set", "model.backbone_name=unet_small", "model.input_resolution=64",
        "training.batch_size=4", "dataset.dataset_fraction=1.0",
        "model.transformer_depth=1", "model.transformer_heads=2",
        "model.freeze_backbone=false", "output.save_checkpoint_every=2",
    ])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "nan" not in res.stdout.lower(), res.stdout
    assert (tmp_path / "final_model").exists()


@pytest.mark.slow
def test_multiview_training_pipeline(tmp_path, stick_spec):
    """Synthetic 3-view dataset → 2 epochs of multi-view training."""
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    h5 = str(tmp_path / "synth_mv.h5")
    generate_synthetic_multiview(stick_spec, h5, n_samples=6, n_views=3, resolution=64)

    res = run_module("smilify_tpu.cli.train_multiview", [
        "--model", STICK_PKL,
        "--data-path", h5,
        "--epochs", "2",
        "--output-dir", str(tmp_path / "mv_run"),
        "--set", "model.backbone_name=unet_small",
        "training.batch_size=2", "dataset.dataset_fraction=1.0",
        "model.transformer_depth=1", "model.transformer_heads=2",
        "model.freeze_backbone=false", "multiview.num_views_to_use=3",
        "multiview.cross_attention_heads=2", "multiview.cross_attention_layers=1",
        "training.use_gt_camera_init=false", "output.save_checkpoint_every=2",
    ])
    assert res.returncode == 0, (res.stdout[-1500:], res.stderr[-2500:])
    assert "nan" not in res.stdout.lower(), res.stdout
    assert (tmp_path / "mv_run" / "final_model").exists()


@pytest.mark.slow
def test_optimize_to_joints_cli(tmp_path):
    """The reference test_smal_fitter_optimize_to_joints analogue: the fitting
    CLI on the bundled replicAnt COCO sample with a 10-iteration schedule."""
    res = run_module("smilify_tpu.cli.optimize_to_joints", [
        "--model", STICK_PKL,
        "--sequence", "replicAnt:SMIL_09_synth.jpg",
        "--data-root", "/root/reference/data/replicAnt_trials/SMIL_COCO",
        "--crop-size", "96", "--use-crop",
        "--output-dir", str(tmp_path / "fit"),
        "--test", "--test-stages", "2", "--vis-frequency", "9",
    ], timeout=3600)
    assert res.returncode == 0, (res.stdout[-1500:], res.stderr[-2500:])
    # exports: collage png + params pkl + mesh ply for the final stage
    frame_dir = tmp_path / "fit" / "SMIL_09_synth"
    assert (frame_dir / "st10_ep0.png").exists()
    assert (frame_dir / "st10_ep0.pkl").exists()
    assert (frame_dir / "st10_ep0.ply").exists()


@pytest.mark.slow
def test_optimize_corpus_cli(tmp_path):
    """Batched corpus fitting: two clips in one jitted optimization, per-clip
    exports in the same layout as the single-clip CLI."""
    res = run_module("smilify_tpu.cli.optimize_corpus", [
        "--model", STICK_PKL,
        "--sequences", "replicAnt:SMIL_00_synth.jpg", "replicAnt:SMIL_01_synth.jpg",
        "--data-root", "/root/reference/data/replicAnt_trials/SMIL_COCO",
        "--crop-size", "64", "--use-crop",
        "--output-dir", str(tmp_path / "corpus"),
        "--test", "--test-stages", "2", "--vis-frequency", "9",
    ], timeout=3600)
    assert res.returncode == 0, (res.stdout[-1500:], res.stderr[-2500:])
    for clip in ("SMIL_00_synth", "SMIL_01_synth"):
        for ext in ("png", "pkl", "ply"):
            assert (tmp_path / "corpus" / clip / f"st10_ep0.{ext}").exists()


def test_synthetic_multiview_generator(tmp_path, stick_spec):
    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    h5 = str(tmp_path / "s.h5")
    generate_synthetic_multiview(stick_spec, h5, n_samples=2, n_views=2, resolution=64,
                                 render_images=False)
    ds = MultiViewHDF5Dataset(h5)
    s = ds[0]
    assert s["images"].shape == (2, 64, 64, 3)
    assert s["has_3d_data"]
    # keypoints must reproject: check stored 2D vs projecting stored 3D
    from smilify_tpu.data.canonical_frame import project_world_to_pixel

    uv = project_world_to_pixel(
        s["keypoints_3d"], s["camera_extrinsics_R"][0], s["camera_extrinsics_t"][0],
        s["camera_intrinsics"][0],
    )
    vis = s["keypoint_visibility"][0] > 0
    np.testing.assert_allclose(uv[vis], s["keypoints_2d"][0][vis], atol=0.01)


def test_iterate_batches_workers_and_skip():
    """Threaded prefetch returns the same batches as the serial path; failing
    samples are dropped and backfilled (per-sample resilience)."""
    import numpy as np

    from smilify_tpu.train.trainer import iterate_batches

    class DS:
        def __init__(self, n, bad=()):
            self.n, self.bad = n, set(bad)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            if i in self.bad:
                raise ValueError("corrupt sample")
            return {"x": np.full((2,), i, np.float32)}

    rng = np.random.default_rng(0)
    serial = list(iterate_batches(DS(17), 4, rng, shuffle=False))
    rng = np.random.default_rng(0)
    threaded = list(iterate_batches(DS(17), 4, rng, shuffle=False, num_workers=3))
    assert len(serial) == len(threaded) == 4
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["x"], b["x"])

    # two bad samples → still full static-shape batches, remaining backfilled
    rng = np.random.default_rng(0)
    got = list(iterate_batches(DS(18, bad=(3, 7)), 4, rng, shuffle=False,
                               num_workers=2, skip_errors=True))
    seen = np.concatenate([b["x"][:, 0] for b in got])
    assert len(got) == 4 and len(seen) == 16
    assert 3.0 not in seen and 7.0 not in seen

    # serial path honors skip_errors too
    rng = np.random.default_rng(0)
    got = list(iterate_batches(DS(9, bad=(0,)), 4, rng, shuffle=False, skip_errors=True))
    assert len(got) == 2


class _PicklableDS:
    """Module-level so spawn workers can unpickle it (function-local classes
    cannot ship to spawned interpreters)."""

    def __init__(self, n, bad=()):
        self.n, self.bad = n, tuple(bad)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i in self.bad:
            raise ValueError("corrupt sample")
        return {"x": np.full((2,), i, np.float32)}


def test_iterate_batches_process_pool():
    """worker_mode='process' (spawn context — forking a jax process is a
    deadlock risk) returns the same batches as the serial path and honors
    skip_errors."""
    import numpy as np

    from smilify_tpu.train.trainer import iterate_batches

    DS = _PicklableDS
    rng = np.random.default_rng(0)
    serial = list(iterate_batches(DS(13), 4, rng, shuffle=False))
    rng = np.random.default_rng(0)
    procs = list(iterate_batches(DS(13), 4, rng, shuffle=False,
                                 num_workers=2, worker_mode="process"))
    assert len(serial) == len(procs) == 3
    for a, b in zip(serial, procs):
        np.testing.assert_array_equal(a["x"], b["x"])

    rng = np.random.default_rng(0)
    got = list(iterate_batches(DS(14, bad=(5,)), 4, rng, shuffle=False,
                               num_workers=2, worker_mode="process",
                               skip_errors=True))
    seen = np.concatenate([b["x"][:, 0] for b in got])
    assert len(seen) == 12 and 5.0 not in seen


class _EpochDS:
    """Module-level (spawn-picklable) dataset whose samples depend on the
    current epoch — verifies set_epoch forwarding into persistent workers."""

    def __init__(self, n):
        self.n = n
        self.epoch = 0

    def set_epoch(self, e):
        self.epoch = int(e)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.array([i, self.epoch], np.float32)}


class _PidDS:
    """Records which worker process served each sample."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import os

        return {"x": np.array([i, os.getpid()], np.int64)}


def test_process_pool_index_affinity():
    """Sample j must always be served by worker j % W (stable across epochs):
    per-worker DecodedSampleCaches then hold DISJOINT shards — a free-for-all
    pool would duplicate the cache up to W times and re-decode samples that
    another worker already cached."""
    from smilify_tpu.train.trainer import iterate_batches

    ds = _PidDS(12)
    pid_of = {}
    for _ in range(2):  # two epochs: affinity must be stable across calls
        rng = np.random.default_rng(0)
        for b in iterate_batches(ds, 4, rng, shuffle=False,
                                 num_workers=2, worker_mode="process"):
            for j, pid in b["x"]:
                pid_of.setdefault(int(j), set()).add(int(pid))
    assert all(len(p) == 1 for p in pid_of.values()), "affinity unstable"
    even = {next(iter(pid_of[j])) for j in pid_of if j % 2 == 0}
    odd = {next(iter(pid_of[j])) for j in pid_of if j % 2 == 1}
    assert len(even) == 1 and len(odd) == 1 and even != odd


def test_staging_collator_guard_blocks_slot_reuse(monkeypatch):
    """Reusing a ring slot must wait for the device transfer registered
    against it (device_put reads the host buffer asynchronously — an
    unguarded overwrite corrupts the in-flight batch); unguarded slots and
    fallback batches must not wait."""
    from smilify_tpu.train import trainer

    waited = []
    monkeypatch.setattr(trainer.jax, "block_until_ready",
                        lambda tok: waited.append(tok))
    coll = trainer.StagingCollator(depth=2)
    samples = [{"x": np.zeros(3, np.float32)}]
    b0 = coll(samples)
    coll.guard(b0, "tok0")
    coll(samples)  # slot 1: no wait
    assert waited == []
    b2 = coll(samples)  # slot 0 reused -> waits on tok0
    assert waited == ["tok0"]
    coll.guard({"x": np.zeros(3, np.float32)}, "alien")  # not a ring batch: no-op
    coll(samples)  # slot 1 reused, never guarded -> no wait
    assert waited == ["tok0"]
    coll.guard(b2, "tok2")
    coll(samples)  # slot 0 again
    assert waited == ["tok0", "tok2"]


def test_wrappers_pickle_roundtrip():
    """DecodedSampleCache / AugmentedDataset must survive pickling — spawn
    process-pool workers unpickle the wrapped dataset, and pickle probes
    dunders via __getattr__ BEFORE __dict__ is restored (a naive delegating
    __getattr__ recurses forever)."""
    import pickle

    from smilify_tpu.data.augmentation import AugmentationParams, AugmentedDataset
    from smilify_tpu.data.cache import DecodedSampleCache

    base = _PicklableDS(5)
    for wrapped in (
        DecodedSampleCache(base),
        AugmentedDataset(base, AugmentationParams(), multiview=False),
        AugmentedDataset(DecodedSampleCache(base), AugmentationParams(), multiview=False),
    ):
        clone = pickle.loads(pickle.dumps(wrapped))
        assert len(clone) == 5
        np.testing.assert_array_equal(clone[1]["x"], wrapped[1]["x"])


def test_process_pool_persistent_and_epoch_forwarding():
    """The process pool is cached across iterate_batches calls (no per-epoch
    respawn/re-pickle; worker caches survive) and the parent's set_epoch is
    forwarded to the workers so per-epoch augmentation RNG stays fresh."""
    from smilify_tpu.train import trainer

    ds = _EpochDS(8)
    rng = np.random.default_rng(0)
    b0 = list(trainer.iterate_batches(ds, 4, rng, shuffle=False,
                                      num_workers=2, worker_mode="process"))
    n_pools = len(trainer._PROCESS_POOLS)
    ds.set_epoch(3)
    rng = np.random.default_rng(0)
    b1 = list(trainer.iterate_batches(ds, 4, rng, shuffle=False,
                                      num_workers=2, worker_mode="process"))
    assert len(trainer._PROCESS_POOLS) == n_pools, "pool was respawned"
    assert all((b["x"][:, 1] == 0).all() for b in b0)
    assert all((b["x"][:, 1] == 3).all() for b in b1), "epoch not forwarded to workers"


def test_decoded_sample_cache():
    """Cache serves identical samples, decodes each index once, and respects
    the byte budget."""
    import numpy as np

    from smilify_tpu.data.cache import DecodedSampleCache

    calls = []

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            calls.append(i)
            return {"x": np.full((8,), i, np.float32)}

    ds = DecodedSampleCache(DS())
    a = ds[2]
    b = ds[2]
    np.testing.assert_array_equal(a["x"], b["x"])
    assert calls == [2]  # second access served from cache

    # tiny budget: first sample cached, rest pass through every time
    calls.clear()
    small = DecodedSampleCache(DS(), max_bytes=40)
    small[0]; small[1]; small[1]
    assert calls == [0, 1, 1]
    assert small.cache_info()["cached"] == 1


def test_staging_collator():
    """Staging collator yields batches numerically identical to np.stack,
    reuses its ring buffers (no per-batch allocation — the tunneled-TPU
    pin/unpin churn fix), and falls back to a fresh stack on ragged batches."""
    import numpy as np

    from smilify_tpu.train.trainer import StagingCollator, iterate_batches

    class DS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32),
                    "y": np.full((2, 2), -i, np.int32)}

    rng = np.random.default_rng(0)
    plain = list(iterate_batches(DS(), 4, rng, shuffle=False))
    rng = np.random.default_rng(0)
    staging = StagingCollator(depth=3)
    staged = []
    bufs = []
    for b in iterate_batches(DS(), 4, rng, shuffle=False, collate=staging):
        bufs.append(b["x"])
        staged.append({k: v.copy() for k, v in b.items()})  # snapshot
    assert len(staged) == len(plain) == 2
    for p, s in zip(plain, staged):
        for k in p:
            np.testing.assert_array_equal(p[k], s[k])
            assert p[k].dtype == s[k].dtype

    # ring reuse: with depth 3, batch 0 and batch 3 share the same buffer
    staging2 = StagingCollator(depth=3)
    samples = [{"x": np.full((3,), i, np.float32)} for i in range(4)]
    out = [staging2(samples) for _ in range(4)]
    assert out[0]["x"] is out[3]["x"]
    assert out[0]["x"] is not out[1]["x"]

    # ragged final batch falls back to a fresh stack (no shape clash)
    ragged = staging2(samples[:2])
    assert ragged["x"].shape == (2, 3)
    assert ragged["x"] is not out[0]["x"]

    # drop_last=False path produces the ragged batch through iterate_batches
    rng = np.random.default_rng(0)
    allb = list(iterate_batches(DS(), 4, rng, shuffle=False, drop_last=False,
                                collate=StagingCollator(depth=2)))
    assert [b["x"].shape[0] for b in allb] == [4, 4, 3]
