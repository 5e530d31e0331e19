"""Round-3 trainer conventions:

  * val-selected ``best_model`` + rolling ``epoch_N`` + ``final_model``
    checkpoints (reference train_multiview_regressor.py:2661-2671);
  * ``best_model``-first auto-discovery at inference
    (reference run_multiview_inference.py:66,298-305);
  * multi-host launch detection + process-0 gating
    (reference train_multiview_regressor.py:3134-3172,131-253);
  * BatchNorm running stats advancing per microbatch under gradient
    accumulation (reference no_sync microbatching, :601-638).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg(**output_overrides):
    from smilify_tpu.train.config import load_config

    overrides = {f"output.{k}": v for k, v in output_overrides.items()}
    return load_config(None, overrides=overrides, mode="single_view")


def _state(val_losses):
    from smilify_tpu.train.trainer import TrainState

    history = [{"epoch": i, "loss": 1.0, "val_loss": v}
               for i, v in enumerate(val_losses)]
    return TrainState(
        params={"w": np.ones((2, 2), np.float32)},
        batch_stats={},
        opt_state={"m": np.zeros((2, 2), np.float32)},
        epoch=len(val_losses) - 1,
        history=history,
    )


@pytest.mark.smoke
def test_best_model_and_epoch_checkpoints(tmp_path):
    from smilify_tpu.train.trainer import end_of_epoch_outputs

    cfg = _tiny_cfg(save_checkpoint_every=2, plot_history_every=2)
    out = str(tmp_path)

    # epoch 0: val improves from inf → best_model written; cadence not hit
    best = end_of_epoch_outputs(out, _state([0.5]), cfg, 0, False, float("inf"))
    assert best == 0.5
    assert os.path.exists(os.path.join(out, "best_model.meta.json"))
    assert not os.path.exists(os.path.join(out, "final_model.meta.json"))

    # epoch 1: val worsens → best untouched; cadence hit → epoch_1 + final
    best = end_of_epoch_outputs(out, _state([0.5, 0.9]), cfg, 1, False, best)
    assert best == 0.5
    assert os.path.exists(os.path.join(out, "epoch_1.meta.json"))
    assert os.path.exists(os.path.join(out, "final_model.meta.json"))
    with open(os.path.join(out, "best_model.meta.json")) as f:
        assert json.load(f)["epoch"] == 0  # still the epoch-0 save

    # epoch 2: val improves → best_model rewritten; last_epoch forces final
    best = end_of_epoch_outputs(out, _state([0.5, 0.9, 0.3]), cfg, 2, True, best)
    assert best == 0.3
    with open(os.path.join(out, "best_model.meta.json")) as f:
        assert json.load(f)["epoch"] == 2
    assert os.path.exists(os.path.join(out, "epoch_2.meta.json"))


def test_checkpoint_dir_nesting(tmp_path):
    """output.checkpoint_dir nests checkpoints under the run root (reference
    default layout); discovery searches there too."""
    from smilify_tpu.cli.run_inference import discover_checkpoint
    from smilify_tpu.train.trainer import end_of_epoch_outputs

    cfg = _tiny_cfg(save_checkpoint_every=1, checkpoint_dir="checkpoints")
    end_of_epoch_outputs(str(tmp_path), _state([0.4]), cfg, 0, True, float("inf"))
    nested = tmp_path / "checkpoints"
    assert (nested / "best_model.meta.json").exists()
    assert (nested / "final_model.meta.json").exists()
    assert discover_checkpoint(str(tmp_path)) == str(nested / "best_model")


def test_checkpoint_discovery_order(tmp_path):
    from smilify_tpu.cli.run_inference import discover_checkpoint

    run = tmp_path / "run"
    run.mkdir()

    def mk(name):
        (run / name).mkdir()
        (run / f"{name}.meta.json").write_text("{}")

    # only epochs → newest epoch
    mk("epoch_3")
    mk("epoch_10")
    assert discover_checkpoint(str(run)) == str(run / "epoch_10")
    # final_model outranks epochs
    mk("final_model")
    assert discover_checkpoint(str(run)) == str(run / "final_model")
    # best_model outranks final_model
    mk("best_model")
    assert discover_checkpoint(str(run)) == str(run / "best_model")
    # a direct checkpoint path is returned unchanged
    assert discover_checkpoint(str(run / "epoch_3")) == str(run / "epoch_3")


def test_plot_history_cadence(tmp_path):
    """History plots follow output.plot_history_every, independent of the
    checkpoint cadence."""
    from smilify_tpu.train.trainer import end_of_epoch_outputs

    cfg = _tiny_cfg(save_checkpoint_every=10, plot_history_every=1, plots_dir="plots")
    end_of_epoch_outputs(str(tmp_path), _state([0.9]), cfg, 0, False, 0.1)
    plot = tmp_path / "plots" / "training_history.png"
    assert plot.exists()
    # no checkpoints at all this epoch (cadence 10, val didn't improve)
    assert not (tmp_path / "final_model.meta.json").exists()


# ---------------------------------------------------------------------------
# multi-host wiring
# ---------------------------------------------------------------------------


def test_multihost_env_detection():
    from smilify_tpu.train.multihost import detect_multihost_env

    assert not detect_multihost_env({})
    assert detect_multihost_env({"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234"})
    assert detect_multihost_env({"SMILIFY_MULTIHOST": "1"})
    assert not detect_multihost_env({"SMILIFY_MULTIHOST": "0"})
    # worker-id vars need world-size > 1 corroboration: single-host GCE TPU
    # VMs set TPU_WORKER_ID=0 and any srun job sets SLURM_PROCID — those must
    # NOT auto-trigger jax.distributed.initialize()
    assert not detect_multihost_env({"TPU_WORKER_ID": "0"})
    assert not detect_multihost_env(
        {"TPU_WORKER_ID": "0", "TPU_WORKER_HOSTNAMES": "t1k-n0"})
    assert detect_multihost_env(
        {"TPU_WORKER_ID": "1", "TPU_WORKER_HOSTNAMES": "t1k-n0,t1k-n1"})
    assert not detect_multihost_env({"SLURM_PROCID": "0", "SLURM_NTASKS": "1"})
    assert not detect_multihost_env({"SLURM_PROCID": "3"})
    assert detect_multihost_env({"SLURM_PROCID": "3", "SLURM_NTASKS": "4"})


def test_shard_dataset_for_process(monkeypatch):
    """Per-host shard: strided disjoint indices, wrap-padded to equal length,
    local batch = global // process_count; the wrapper forwards set_epoch to
    the inner dataset (frozen-at-epoch-0 augmentation regression)."""
    import jax

    from smilify_tpu.train.multihost import shard_dataset_for_process

    class DS:
        def __init__(self, n):
            self.n, self.epoch = n, 0

        def set_epoch(self, e):
            self.epoch = int(e)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    ds = DS(7)
    bs, local = shard_dataset_for_process(ds, 8)
    assert bs == 4
    # host 1 of 2 over 7 samples: strided [1, 3, 5] wrap-padded to 4
    assert len(local) == 4
    assert [local[i] for i in range(4)] == [1, 3, 5, 1]
    local.set_epoch(5)
    assert ds.epoch == 5 and local.epoch == 5


def test_maybe_initialize_multihost_noop():
    """No flag + clean env → no jax.distributed.initialize call."""
    from smilify_tpu.train import multihost

    assert multihost.maybe_initialize_multihost(False, environ={}) is False


def test_local_batch_size_math():
    from smilify_tpu.train.multihost import local_batch_size

    assert local_batch_size(64, process_count=4) == 16
    assert local_batch_size(66, process_count=4) == 16  # rounded down
    assert local_batch_size(2, process_count=4) == 1    # min one per host


def test_primary_gating(monkeypatch):
    from smilify_tpu.train import multihost

    calls = []

    @multihost.primary_only
    def write_stuff(x):
        calls.append(x)
        return x

    monkeypatch.setattr(multihost, "process_index", lambda: 0)
    assert write_stuff(1) == 1
    monkeypatch.setattr(multihost, "process_index", lambda: 3)
    assert write_stuff(2) is None
    assert calls == [1]


# ---------------------------------------------------------------------------
# BN running stats under gradient accumulation
# ---------------------------------------------------------------------------


def test_batch_stats_advance_under_accumulation():
    """The accumulation scan must thread batch_stats per microbatch — the
    final stats equal sequentially applying each microbatch's update, not the
    init-time stats (round-2 bug: accum branch returned the input stats)."""
    from smilify_tpu.train.trainer import make_train_step
    import optax

    def apply_fn(variables, batch, train):
        params, stats = variables["params"], variables["batch_stats"]
        preds = batch["x"] * params["w"]
        new_stats = {"mean": 0.9 * stats["mean"] + 0.1 * jnp.mean(batch["x"])}
        return preds, new_stats

    def loss_fn(preds, batch):
        l = jnp.mean(preds**2)
        return l, {"l": l}

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones(())}
    stats = {"mean": jnp.zeros(())}
    opt_state = tx.init(params)
    batch = {"x": jnp.arange(8.0)}  # microbatches [0..3] then [4..7]

    step = make_train_step(apply_fn, loss_fn, tx, accum_steps=2)
    _, new_stats, _, _, _ = step(params, stats, opt_state, batch)

    m1 = 0.9 * 0.0 + 0.1 * np.mean([0, 1, 2, 3])
    m2 = 0.9 * m1 + 0.1 * np.mean([4, 5, 6, 7])
    np.testing.assert_allclose(float(new_stats["mean"]), m2, rtol=1e-6)


def test_flax_batchnorm_advances_under_accumulation():
    """Eval-mode outputs change after one accum>1 step on a real BN module
    (the VERDICT's acceptance test)."""
    import flax.linen as nn
    import optax

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            x = nn.Dense(4)(x)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)

    model = M()
    x0 = jnp.asarray(np.random.RandomState(0).randn(8, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def apply_fn(variables, batch, train):
        if train:
            out, mut = model.apply(variables, batch["x"], train=True,
                                   mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return model.apply(variables, batch["x"], train=False), None

    def loss_fn(preds, batch):
        l = jnp.mean(preds**2)
        return l, {"l": l}

    tx = optax.sgd(1e-3)
    step = make_train_step_ref(apply_fn, loss_fn, tx, accum_steps=2)
    _, new_stats, _, _, _ = step(params, stats, tx.init(params),
                                 {"x": x0 * 3.0 + 1.0})

    eval_before = model.apply({"params": params, "batch_stats": stats}, x0, train=False)
    eval_after = model.apply({"params": params, "batch_stats": new_stats}, x0, train=False)
    assert not np.allclose(np.asarray(eval_before), np.asarray(eval_after)), (
        "BN running stats did not advance under gradient accumulation"
    )


def make_train_step_ref(*a, **kw):
    from smilify_tpu.train.trainer import make_train_step

    return make_train_step(*a, **kw)


def test_resume_round_trip(tmp_path):
    """try_resume restores params/batch_stats/opt_state and picks the next
    epoch + history from the sidecar meta (reference --resume_checkpoint,
    README.md:214-220)."""
    from smilify_tpu.train.trainer import TrainState, save_checkpoint, try_resume

    cfg = _tiny_cfg()
    saved = TrainState(
        params={"w": np.full((2, 2), 3.0, np.float32)},
        batch_stats={"bn": {"mean": np.full((4,), 0.25, np.float32)}},
        opt_state={"m": np.full((2, 2), 0.5, np.float32)},
        epoch=4,
        history=[{"epoch": i, "val_loss": 1.0 - 0.1 * i} for i in range(5)],
    )
    save_checkpoint(str(tmp_path), saved, cfg, name="epoch_4")

    fresh = TrainState(
        params={"w": np.zeros((2, 2), np.float32)},
        batch_stats={},
        opt_state=None,
    )
    state, start_epoch = try_resume(str(tmp_path), "epoch_4", fresh)
    assert start_epoch == 5
    np.testing.assert_array_equal(np.asarray(state.params["w"]), 3.0 * np.ones((2, 2)))
    np.testing.assert_array_equal(
        np.asarray(state.batch_stats["bn"]["mean"]), 0.25 * np.ones(4))
    np.testing.assert_array_equal(np.asarray(state.opt_state["m"]), 0.5 * np.ones((2, 2)))
    assert [h["epoch"] for h in state.history] == [0, 1, 2, 3, 4]

    # absolute path works too
    state2, e2 = try_resume("/nonexistent", str(tmp_path / "epoch_4"), fresh)
    assert e2 == 5

    # no resume requested → untouched state, epoch 0
    untouched = TrainState(params={"w": np.zeros((2, 2), np.float32)},
                           batch_stats={}, opt_state=None)
    state3, e3 = try_resume(str(tmp_path), None, untouched)
    assert e3 == 0 and state3 is untouched


def test_resume_reset_ief_token_embedding(tmp_path):
    """The checkpoint-migration flag keeps the FRESH init for the IEF
    estimate-embedding params and restores everything else (reference
    base_config.py:522)."""
    from smilify_tpu.train.trainer import TrainState, save_checkpoint, try_resume

    cfg = _tiny_cfg()
    saved = TrainState(
        params={"decoder": {"estimate_embed": {"kernel": np.full((3,), 7.0, np.float32)},
                            "out": {"kernel": np.full((3,), 2.0, np.float32)}}},
        batch_stats={},
        opt_state=None,
        epoch=0,
    )
    save_checkpoint(str(tmp_path), saved, cfg, name="ckpt")

    fresh = TrainState(
        params={"decoder": {"estimate_embed": {"kernel": np.zeros(3, np.float32)},
                            "out": {"kernel": np.zeros(3, np.float32)}}},
        batch_stats={},
        opt_state=None,
    )
    state, _ = try_resume(str(tmp_path), "ckpt", fresh, reset_ief_token_embedding=True)
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["estimate_embed"]["kernel"]), np.zeros(3))
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["out"]["kernel"]), 2.0 * np.ones(3))
