"""Host input-pipeline starvation check (VERDICT r1 weak #5 'done' criterion).

Measures the single-view trainer's per-step wall time at batch 8 in three
modes on the bundled replicAnt data:
  * synthetic  — pre-materialized device arrays (pure device step time),
  * loader@0   — serial in-loop dataset access (round-1 behavior),
  * loader@N   — the threaded prefetch batcher (current default).
The pipeline is healthy when loader@N is within ~10% of synthetic.

Usage: python tools/bench_input_pipeline.py [--workers 8] [--batch 8] [--steps 6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import numpy as np

TEX = "/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX"
STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--raw", action="store_true",
                    help="bench the raw replicAnt loader instead of the HDF5 path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.data.replicant import ReplicantDataset
    from smilify_tpu.models.regressor import (
        RegressorConfig, SMILRegressor, compute_batch_loss, decode_predictions,
    )
    from smilify_tpu.train.trainer import iterate_batches, make_train_step

    spec = load_model_spec(STICK, align_symmetry=False)
    if args.raw:
        ds = ReplicantDataset(TEX, spec.joint_names, image_size=args.res)
        ds_kind = "replicant_raw"
    else:
        # the production path: preprocessed single-view HDF5 (the reference's
        # "10-12x faster data loading" claim, neuralSMIL/README.md:309)
        from smilify_tpu.data.hdf5_dataset import SingleViewHDF5Dataset

        h5 = f"/tmp/bench_input_{args.res}.h5"
        if not os.path.exists(h5):
            from smilify_tpu.cli.preprocess_replicant import main as prep

            prep(["--input", TEX, "--output", h5, "--model", STICK,
                  "--resolution", str(args.res)])
        ds = SingleViewHDF5Dataset(h5)
        ds_kind = "singleview_hdf5"
    cfg = RegressorConfig(backbone="resnet50", n_pose=spec.n_joints - 1,
                          n_betas=spec.n_betas, n_joints=spec.n_joints,
                          decoder_depth=2, ief_iters=2)
    model = SMILRegressor(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, args.res, args.res, 3)))
    params, stats = variables["params"], variables.get("batch_stats", {})

    def apply_fn(v, batch, train):
        (raw, hist), mut = model.apply(v, batch["image"], train=train,
                                       mutable=["batch_stats"] if train else [],
                                       rngs={"dropout": jax.random.PRNGKey(0)} if train else None)
        preds = decode_predictions(cfg, raw, spec)
        return preds, (mut.get("batch_stats", v.get("batch_stats", {})) if train else None)

    def loss_fn(preds, batch):
        targets = {"global_rot": batch["global_rot"], "joint_rot": batch["joint_rot"],
                   "betas": batch["betas"][..., : spec.n_betas]}
        return compute_batch_loss(spec, cfg, preds, targets,
                                  {"global_rot": 1.0, "joint_rot": 1.0, "betas": 1.0},
                                  image_size=(args.res, args.res))

    tx = optax.adamw(1e-4)
    step = make_train_step(apply_fn, loss_fn, tx, 1)
    opt_state = tx.init(params)

    def run_epoch(batch_iter):
        nonlocal params, stats, opt_state
        n = 0
        t0 = time.perf_counter()
        for batch in batch_iter:
            params, stats, opt_state, loss, _ = step(params, stats, opt_state, batch)
            n += 1
            if n >= args.steps:
                break
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / max(n, 1)

    rng = np.random.default_rng(0)

    # warmup / compile on one real batch
    warm = next(iterate_batches(ds, args.batch, rng, shuffle=False))
    warm = {k: v for k, v in warm.items() if isinstance(v, np.ndarray) and v.dtype != object}
    for _ in range(2):
        params, stats, opt_state, loss, _ = step(params, stats, opt_state, warm)
    jax.block_until_ready(loss)

    # synthetic: the same batch replayed (no host loading at all)
    def synth_iter():
        while True:
            yield warm

    t_synth = run_epoch(synth_iter())

    def _clean(b):
        return {k: v for k, v in b.items()
                if isinstance(v, np.ndarray) and v.dtype != object}

    def loader_iter(workers):
        while True:  # cycle the 20-image dataset to fill the step budget
            for b in iterate_batches(ds, args.batch, rng, num_workers=workers):
                yield _clean(b)

    t_serial = run_epoch(loader_iter(0))
    t_threaded = run_epoch(loader_iter(args.workers))

    # process pool (true parallelism on multi-core hosts; on this 1-core box
    # it measures the serialization floor)
    def loader_iter_proc(workers):
        while True:
            for b in iterate_batches(ds, args.batch, rng, num_workers=workers,
                                     worker_mode="process"):
                yield _clean(b)

    n_proc = min(args.workers, max(1, (os.cpu_count() or 1)))
    t_process = run_epoch(loader_iter_proc(n_proc))

    # decode-once RAM cache: first epoch pays decode, later epochs serve from
    # memory — the steady-state loader cost for multi-epoch training
    from smilify_tpu.data.cache import DecodedSampleCache

    cached = DecodedSampleCache(ds, eager=True)

    def cached_iter():
        while True:
            for b in iterate_batches(cached, args.batch, rng):
                yield _clean(b)

    t_cached = run_epoch(cached_iter())

    out = {
        "batch": args.batch,
        "resolution": args.res,
        "dataset": ds_kind,
        "host_cores": os.cpu_count(),
        "synthetic_step_ms": round(t_synth * 1000, 2),
        "loader_serial_step_ms": round(t_serial * 1000, 2),
        f"loader_{args.workers}workers_step_ms": round(t_threaded * 1000, 2),
        f"loader_{n_proc}procs_step_ms": round(t_process * 1000, 2),
        "loader_cached_step_ms": round(t_cached * 1000, 2),
        "overhead_vs_synthetic_pct": round(100 * (t_threaded / t_synth - 1), 1),
        "cached_overhead_vs_synthetic_pct": round(100 * (t_cached / t_synth - 1), 1),
    }
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(__file__), "input_pipeline_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
