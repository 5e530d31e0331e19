"""AOT serving export (smilify_tpu/serve.py): checkpoint → one-file
StableHLO artifact with baked-in weights → deserialize → identical outputs.

The reference has no AOT path (it redeploys Python model classes + .pth,
run_multiview_inference.py:298-305); these tests pin our replacement's
contract: exact output parity with the live model, symbolic-batch service of
multiple batch sizes from one artifact, and a self-describing sidecar.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
RES = 32


def _make_checkpoint(tmp_path, mode):
    """Init a tiny model and save a real checkpoint the inference/serving
    loaders can rebuild (config embedded in .meta.json)."""
    from smilify_tpu.train.config import load_config, resolve_model_spec
    from smilify_tpu.train.trainer import TrainState, save_checkpoint

    overrides = {
        "smal_model.smal_file": STICK,
        "model.backbone_name": "unet_micro",
        "model.input_resolution": RES,
        "model.transformer_depth": 1,
        "model.transformer_heads": 2,
        "model.freeze_backbone": False,
    }
    if mode == "multi_view":
        overrides["multiview.num_views_to_use"] = 2
    cfg = load_config(None, overrides=overrides, mode=mode)
    spec = resolve_model_spec(cfg)
    rcfg = cfg.regressor_config(spec)

    if mode == "multi_view":
        from smilify_tpu.models.multiview import MultiViewSMILRegressor

        model = MultiViewSMILRegressor(rcfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, rcfg.max_views, RES, RES, 3)),
            jnp.ones((1, rcfg.max_views), bool),
            jnp.zeros((1, rcfg.max_views), jnp.int32),
        )
    else:
        from smilify_tpu.models.regressor import SMILRegressor

        model = SMILRegressor(rcfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3))
        )

    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state={"dummy": np.zeros(1, np.float32)},
    )
    ckpt_dir = str(tmp_path / mode)
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, state, cfg, name="final_model")
    return os.path.join(ckpt_dir, "final_model")


def _inputs(mode, batch, n_views=2, seed=0):
    rng = np.random.RandomState(seed)
    if mode == "multi_view":
        return (
            jnp.asarray(rng.rand(batch, n_views, RES, RES, 3), jnp.float32),
            jnp.ones((batch, n_views), bool),
            jnp.zeros((batch, n_views), jnp.int32),
        )
    return (jnp.asarray(rng.rand(batch, RES, RES, 3), jnp.float32),)


@pytest.mark.parametrize("mode", ["single_view", "multi_view"])
def test_export_roundtrip_matches_live(tmp_path, mode):
    from smilify_tpu.cli.run_inference import load_model_from_checkpoint
    from smilify_tpu.serve import (
        build_predict_fn,
        export_serving_artifact,
        load_serving_artifact,
    )

    ckpt = _make_checkpoint(tmp_path, mode)
    out = str(tmp_path / f"{mode}.jaxexport")
    backend = jax.default_backend()
    meta = export_serving_artifact(ckpt, out, batch_size=2, platforms=(backend,))

    assert os.path.exists(out)
    assert meta["mode"] == mode
    assert meta["input_resolution"] == RES
    with open(out + ".json") as f:
        sidecar = json.load(f)
    assert sidecar["batch_size"] == 2
    assert "global_rot" in sidecar["output_keys"]

    served_model = load_serving_artifact(out)
    inputs = _inputs(mode, 2)
    served = served_model(*inputs)

    model, cfg, rcfg, spec, params, batch_stats, _ = load_model_from_checkpoint(ckpt)
    live = build_predict_fn(model, rcfg, spec, params, batch_stats,
                            mode == "multi_view")(*inputs)

    assert set(served.keys()) == set(live.keys())
    for k in live:
        np.testing.assert_allclose(
            np.asarray(served[k], np.float32), np.asarray(live[k], np.float32),
            rtol=0, atol=1e-5, err_msg=k,
        )


def test_symbolic_batch_serves_multiple_sizes(tmp_path):
    from smilify_tpu.cli.run_inference import load_model_from_checkpoint
    from smilify_tpu.serve import (
        build_predict_fn,
        export_serving_artifact,
        load_serving_artifact,
    )

    ckpt = _make_checkpoint(tmp_path, "single_view")
    out = str(tmp_path / "sv_sym.jaxexport")
    backend = jax.default_backend()
    meta = export_serving_artifact(ckpt, out, batch_size=0, platforms=(backend,))
    assert meta["batch_size"] == "symbolic"

    served_model = load_serving_artifact(out)
    model, cfg, rcfg, spec, params, batch_stats, _ = load_model_from_checkpoint(ckpt)
    live_fn = build_predict_fn(model, rcfg, spec, params, batch_stats, False)

    for batch in (1, 3):
        inputs = _inputs("single_view", batch, seed=batch)
        served = served_model(*inputs)
        live = live_fn(*inputs)
        assert served["global_rot"].shape[0] == batch
        for k in live:
            np.testing.assert_allclose(
                np.asarray(served[k], np.float32), np.asarray(live[k], np.float32),
                rtol=0, atol=1e-5, err_msg=f"batch {batch}: {k}",
            )


def test_export_cli_with_verify(tmp_path):
    from smilify_tpu.cli.export_serving import main

    ckpt = _make_checkpoint(tmp_path, "single_view")
    out = str(tmp_path / "cli.jaxexport")
    main(["--checkpoint", ckpt, "--output", out, "--batch", "2",
          "--platforms", jax.default_backend(), "--verify"])
    assert os.path.exists(out) and os.path.exists(out + ".json")
