"""Export a trained checkpoint as an AOT serving artifact.

One file holds the StableHLO program AND the weights; a serving host loads
it with :func:`smilify_tpu.serve.load_serving_artifact` (jax only — no model
code, no config system). See ``smilify_tpu/serve.py`` for the deployment
rationale; the reference has no equivalent (it redeploys Python model
classes + ``.pth``, run_multiview_inference.py:298-305).

Usage:
  python -m smilify_tpu.cli.export_serving --checkpoint runs/sv/final_model \
      --output sv_model.jaxexport [--batch 8] [--platforms cpu,tpu] [--verify]

``--batch 0`` (default) exports a symbolic batch dimension (any batch size
at serve time); a fixed ``--batch N`` pins it. ``--verify`` round-trips the
artifact and compares it against the live model on a random batch.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="export AOT serving artifact")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size (0 = symbolic/any)")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ap.add_argument("--shard-data", action="store_true",
                    help="export SPMD-partitioned over a ('data',) mesh of all "
                         "visible devices (fixed --batch divisible by the "
                         "device count)")
    ap.add_argument("--verify", action="store_true",
                    help="deserialize and compare against the live model")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from smilify_tpu.serve import export_serving_artifact

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    meta = export_serving_artifact(args.checkpoint, args.output,
                                   batch_size=args.batch, platforms=platforms,
                                   shard_data=args.shard_data)
    sharded = f", sharded over {meta['n_devices']} devices" if meta["data_sharded"] else ""
    print(f"exported {meta['mode']} model ({meta['backbone']}, "
          f"res {meta['input_resolution']}, batch {meta['batch_size']}, "
          f"platforms {','.join(meta['platforms'])}{sharded}) "
          f"→ {args.output} ({meta['artifact_bytes']/1e6:.1f} MB)")

    if args.verify:
        import numpy as np
        import jax.numpy as jnp

        from smilify_tpu.cli.run_inference import load_model_from_checkpoint
        from smilify_tpu.serve import build_predict_fn, load_serving_artifact

        model, cfg, rcfg, spec, params, batch_stats, _ = (
            load_model_from_checkpoint(args.checkpoint)
        )
        is_mv = cfg.mode == "multi_view"
        res = cfg.model.input_resolution or 224
        B = args.batch or 2
        rng = np.random.RandomState(0)
        if is_mv:
            V = rcfg.max_views
            inputs = (jnp.asarray(rng.rand(B, V, res, res, 3), jnp.float32),
                      jnp.ones((B, V), bool),
                      jnp.zeros((B, V), jnp.int32))
        else:
            inputs = (jnp.asarray(rng.rand(B, res, res, 3), jnp.float32),)
        live = build_predict_fn(model, rcfg, spec, params, batch_stats, is_mv)(*inputs)
        served = load_serving_artifact(args.output)(*inputs)
        worst = max(
            float(jnp.max(jnp.abs(served[k].astype(jnp.float32)
                                  - live[k].astype(jnp.float32))))
            for k in live
        )
        print(f"verify: {len(live)} outputs, max |artifact - live| = {worst:.3e}")
        if worst > 1e-4:
            raise SystemExit("verification FAILED (deviation > 1e-4)")


if __name__ == "__main__":
    main()
