"""AOT serving export — freeze the inference step into a portable artifact.

The reference "deploys" by shipping its Python model classes plus a ``.pth``
checkpoint and rebuilding the module graph at load time
(``run_multiview_inference.py:298-305``, ``run_singleview_inference.py``).
The TPU-native deployment story is ahead-of-time compilation:
:func:`export_serving_artifact` loads a training checkpoint, closes the
jitted predict function over its weights (baked into the program as
constants), lowers it to StableHLO for the requested platforms via
``jax.export``, and serializes everything — weights, program, calling
convention — into ONE file. :func:`load_serving_artifact` runs it with no
model classes, no config system, and no checkpoint format in sight: the
serving host needs jax and the artifact, nothing else. This also freezes
the numerics: the artifact replays the exact traced computation even if the
framework's model code changes underneath it.

The batch dimension may be fixed (one compiled specialization, fastest) or
symbolic (``batch_size=0`` exports shape-polymorphic code that serves any
batch size; XLA specializes per concrete batch at first call).

Outputs are the decoded prediction dict of
:func:`smilify_tpu.models.regressor.decode_predictions` (or the multi-view
analogue): axis-angle rotations, betas, trans, per-view cameras — exactly
what the inference CLI consumes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

FORMAT_VERSION = 1


def build_predict_fn(model, rcfg, spec, params, batch_stats, is_mv: bool):
    """The checkpoint's inference step as a pure function of the image batch
    (weights closed over — identical math to ``cli/run_inference.predict``)."""
    import jax

    variables = {"params": params, "batch_stats": batch_stats}

    if is_mv:
        from smilify_tpu.models.multiview import decode_multiview_predictions

        def predict(images, view_mask, camera_ids):
            (raw, _), _ = model.apply(variables, images, view_mask, camera_ids,
                                      train=False, mutable=["batch_stats"])
            preds = decode_multiview_predictions(rcfg, raw, spec)
            preds.pop("ief_history", None)
            return preds

    else:
        from smilify_tpu.models.regressor import decode_predictions

        def predict(images):
            (raw, _), _ = model.apply(variables, images, train=False,
                                      mutable=["batch_stats"])
            preds = decode_predictions(rcfg, raw, spec)
            preds.pop("ief_history", None)
            return preds

    return jax.jit(predict)


def _arg_specs(res: int, batch_size: int, n_views: Optional[int]):
    """ShapeDtypeStructs for the predict signature; batch_size=0 → symbolic."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    b = jexport.symbolic_shape("b")[0] if batch_size == 0 else batch_size
    if n_views is None:
        return (jax.ShapeDtypeStruct((b, res, res, 3), jnp.float32),)
    return (
        jax.ShapeDtypeStruct((b, n_views, res, res, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, n_views), jnp.bool_),
        jax.ShapeDtypeStruct((b, n_views), jnp.int32),
    )


def export_serving_artifact(
    checkpoint: str,
    out_path: str,
    batch_size: int = 0,
    platforms: Sequence[str] = ("cpu", "tpu"),
    shard_data: bool = False,
) -> Dict[str, Any]:
    """Checkpoint → serialized serving artifact at ``out_path`` (+ ``.json``
    sidecar). Returns the metadata dict. ``batch_size=0`` exports a
    shape-polymorphic batch dimension.

    ``shard_data=True`` exports the step SPMD-partitioned over a
    ``('data',)`` mesh spanning all visible devices: weights replicated,
    batch axis sharded — the artifact then serves on a multi-chip slice with
    the same device count (batch_size must be fixed and divisible by it).
    """
    import jax
    from jax import export as jexport

    from smilify_tpu.cli.run_inference import load_model_from_checkpoint

    model, cfg, rcfg, spec, params, batch_stats, _meta = (
        load_model_from_checkpoint(checkpoint)
    )
    is_mv = cfg.mode == "multi_view"
    res = cfg.model.input_resolution or 224
    n_views = rcfg.max_views if is_mv else None

    n_dev = 1
    predict = build_predict_fn(model, rcfg, spec, params, batch_stats, is_mv)
    if shard_data:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from smilify_tpu.train.trainer import data_mesh

        mesh = data_mesh()
        n_dev = mesh.devices.size
        if batch_size == 0 or batch_size % n_dev:
            raise ValueError(
                f"shard_data needs a fixed batch divisible by the mesh "
                f"({n_dev} devices), got batch_size={batch_size}"
            )
        arg_shardings = tuple(
            NamedSharding(mesh, P("data", *([None] * (len(spec_.shape) - 1))))
            for spec_ in _arg_specs(res, batch_size, n_views)
        )
        predict = jax.jit(predict.__wrapped__, in_shardings=arg_shardings)
    exported = jexport.export(predict, platforms=tuple(platforms))(
        *_arg_specs(res, batch_size, n_views)
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)

    try:
        output_keys = sorted(_output_keys(exported))
        output_keys_error = None
    except (AttributeError, TypeError) as e:
        # out_tree introspection is version-sensitive; record the failure in
        # the sidecar instead of silently claiming the artifact has no outputs.
        output_keys = []
        output_keys_error = f"{type(e).__name__}: {e}"
    meta = {
        "format_version": FORMAT_VERSION,
        "mode": cfg.mode,
        "input_resolution": res,
        "n_views": n_views,
        "batch_size": batch_size or "symbolic",
        "data_sharded": bool(shard_data),
        "n_devices": n_dev,
        "platforms": list(platforms),
        "backbone": cfg.model.backbone_name,
        "output_keys": output_keys,
        "jax_version": jax.__version__,
        "artifact_bytes": len(blob),
        "checkpoint": os.path.abspath(checkpoint),
    }
    if output_keys_error is not None:
        meta["output_keys_error"] = output_keys_error
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def _output_keys(exported) -> Tuple[str, ...]:
    """Recover the output dict's key names from the exported out_tree.

    Raises AttributeError/TypeError if the jax.export out_tree layout changes;
    the caller records that in the sidecar rather than swallowing it.
    """
    leaves_or_keys = exported.out_tree.unflatten(
        [None] * exported.out_tree.num_leaves
    )
    return tuple(leaves_or_keys.keys())


class ServingModel:
    """A deserialized artifact: ``ServingModel(path)(images, ...) → preds``.

    The call is jit-wrapped so repeated batches of the same shape reuse one
    executable; a symbolic-batch artifact compiles one specialization per
    distinct batch size.
    """

    def __init__(self, path: str):
        import jax
        from jax import export as jexport

        with open(path, "rb") as f:
            blob = f.read()
        self.exported = jexport.deserialize(bytearray(blob))
        self.meta = None
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                self.meta = json.load(f)
        self._shard = None
        if self.meta and self.meta.get("data_sharded"):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from smilify_tpu.train.trainer import data_mesh

            need = self.meta["n_devices"]
            have = len(jax.devices())
            if have < need:
                raise RuntimeError(
                    f"artifact was exported for a {need}-device mesh; "
                    f"{have} visible"
                )
            mesh = data_mesh(need)
            self._shard = lambda a: jax.device_put(
                a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
            )
        self._call = jax.jit(self.exported.call)

    @property
    def in_avals(self):
        return self.exported.in_avals

    def __call__(self, *args):
        if self._shard is not None:
            import numpy as np

            args = tuple(self._shard(np.asarray(a)) for a in args)
        return self._call(*args)


def load_serving_artifact(path: str) -> ServingModel:
    return ServingModel(path)
