"""Multi-device correctness harness for the neural trainer.

Runs one full sharded `make_train_step` + `make_eval_step` of the multi-view
regressor over an n-device `jax.sharding.Mesh` and checks the losses equal the
single-device values. This is what the reference's DDP path
(train_multiview_regressor.py:131-253: TCPStore rendezvous, DistributedSampler,
no_sync accumulation) reduces to under XLA SPMD; loss parity across mesh sizes
is the invariant DDP only approximates (its gradient all-reduce averages
per-rank means).

Used by ``__graft_entry__.dryrun_multichip`` and by
``tests/test_multidevice.py`` (in a subprocess with 8 virtual CPU devices —
the platform cannot change after backend init).

Run directly:  python -m smilify_tpu.train.multidevice [n_devices]
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_MODEL = "/root/reference/3D_model_prep/SMILy_STICK.pkl"


def toy_model_spec(V_side: int = 8, J: int = 6, B: int = 3, seed: int = 0):
    """A tiny but fully-valid ModelSpec (sphere mesh + joint chain) for SPMD
    invariance tests — the invariants don't depend on the real 3020-vertex
    model, and the small graph cuts the CPU XLA compile from minutes to
    seconds. The driver dryrun keeps the real model."""
    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.core.spec import ModelSpec

    rng = np.random.RandomState(seed)
    n = V_side
    u, w = np.meshgrid(np.linspace(0.15, np.pi - 0.15, n), np.linspace(0, 2 * np.pi, n))
    verts = 0.3 * np.stack(
        [np.sin(u) * np.cos(w), np.sin(u) * np.sin(w), np.cos(u)], -1
    ).reshape(-1, 3).astype(np.float64)
    verts[:, 0] *= 2.0  # elongate along the chain axis
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)
    V = len(verts)

    joints = np.zeros((J, 3))
    joints[:, 0] = np.linspace(-0.5, 0.5, J)
    parents = np.asarray([0] + list(range(J - 1)), np.int32)

    d = np.linalg.norm(verts[:, None] - joints[None], axis=-1)  # (V, J)
    wts = np.exp(-8.0 * d)
    wts = wts / wts.sum(axis=1, keepdims=True)
    Jr = wts / wts.sum(axis=0, keepdims=True)                   # columns sum to 1

    shapedirs = (rng.randn(B, 3 * V) * 0.02).astype(np.float64)
    posedirs = np.zeros((9 * (J - 1), 3 * V))
    names = tuple(f"j{i}" for i in range(J))
    f32 = jnp.float32
    return ModelSpec(
        v_template=jnp.asarray(verts, f32), faces=jnp.asarray(faces),
        shapedirs=jnp.asarray(shapedirs, f32), posedirs=jnp.asarray(posedirs, f32),
        J_regressor=jnp.asarray(Jr, f32), weights=jnp.asarray(wts, f32),
        parents=jnp.asarray(parents), joints_rest=jnp.asarray(joints, f32),
        shape_mean_betas=jnp.zeros((B,), f32), shape_cov=jnp.eye(B, dtype=f32),
        scaledirs=None, transdirs=None, joint_names=names,
        n_verts=V, n_faces=len(faces), n_joints=J, n_betas=B,
        static_joint_locations=False, has_shape_prior=True,
        legacy_dog_keypoints=False, root_joint=names[0],
        torso_joints=(0, 1), ignore_joints=(),
        left_inds=(), right_inds=(), center_inds=(),
        source_path="<toy>",
    )


def tiny_multiview_config(spec, n_views: int = 2):
    """A CPU-runnable MultiViewConfig: unet_small backbone, small decoder,
    f32 compute for exact cross-mesh comparison."""
    import jax.numpy as jnp

    from smilify_tpu.models.multiview import MultiViewConfig

    return MultiViewConfig(
        backbone="unet_micro",
        head_type="transformer",
        rotation_representation="6d",
        n_pose=spec.n_joints - 1,
        n_betas=spec.n_betas,
        n_joints=spec.n_joints,
        scale_trans_mode="ignore",
        ief_iters=1,
        decoder_dim=32,
        decoder_depth=1,
        decoder_heads=2,
        mlp_hidden=64,
        dropout=0.0,
        compute_dtype=jnp.float32,
        max_views=n_views,
        num_canonical_cameras=max(4, n_views),
        fusion_heads=2,
        fusion_layers=1,
        camera_delta_mode=True,
    )


def synthetic_multiview_batch(spec, batch_size: int, n_views: int, res: int,
                              seed: int = 0) -> Dict[str, np.ndarray]:
    """An in-memory batch with the exact keys collate_multiview produces."""
    from smilify_tpu.data.synthetic import ring_cameras_opencv

    rng = np.random.RandomState(seed)
    K = spec.n_joints
    cams = ring_cameras_opencv(n_views, resolution=res)
    Rs = np.stack([c[0] for c in cams]).astype(np.float32)
    ts = np.stack([c[1] for c in cams]).astype(np.float32)
    Ks = np.stack([c[2] for c in cams]).astype(np.float32)
    return {
        "images": rng.rand(batch_size, n_views, res, res, 3).astype(np.float32),
        "view_mask": np.ones((batch_size, n_views), bool),
        "camera_indices": np.tile(np.arange(n_views, dtype=np.int32), (batch_size, 1)),
        "keypoints_2d": (rng.rand(batch_size, n_views, K, 2) * res).astype(np.float32),
        "keypoint_visibility": np.ones((batch_size, n_views, K), np.float32),
        "keypoints_3d": (rng.randn(batch_size, K, 3) * 0.1).astype(np.float32),
        "camera_intrinsics": np.tile(Ks, (batch_size, 1, 1, 1)),
        "camera_extrinsics_R": np.tile(Rs, (batch_size, 1, 1, 1)),
        "camera_extrinsics_t": np.tile(ts, (batch_size, 1, 1)),
        "global_rot": (rng.randn(batch_size, 3) * 0.2).astype(np.float32),
        "joint_rot": (rng.randn(batch_size, K - 1, 3) * 0.1).astype(np.float32),
        "betas": (rng.randn(batch_size, spec.n_betas) * 0.2).astype(np.float32),
        "trans": np.zeros((batch_size, 3), np.float32),
    }


def _build_setup(spec, n_views: int, res: int, accum_steps: int,
                 joint_importance=None):
    import jax
    import jax.numpy as jnp
    import optax

    from smilify_tpu.models.multiview import MultiViewSMILRegressor
    from smilify_tpu.train.multiview_setup import (
        make_multiview_apply_fn,
        make_multiview_loss_fn,
    )
    from smilify_tpu.train.trainer import make_eval_step, make_train_step

    rcfg = tiny_multiview_config(spec, n_views)
    model = MultiViewSMILRegressor(rcfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, n_views, res, res, 3)),
        jnp.ones((1, n_views), bool),
        jnp.zeros((1, n_views), jnp.int32),
    )
    apply_fn = make_multiview_apply_fn(model, rcfg, spec, (res, res))
    weights = {"keypoint_2d": 1.0, "keypoint_3d": 1.0, "joint_rot": 0.1,
               "betas": 0.1, "cam_rot": 0.1, "fov": 0.01,
               "triangulation_consistency": 0.1}
    loss_fn = make_multiview_loss_fn(spec, rcfg, weights, (res, res),
                                     joint_importance=joint_importance)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    train_step = make_train_step(apply_fn, loss_fn, tx, accum_steps)
    eval_step = make_eval_step(apply_fn, loss_fn)
    return variables, tx, train_step, eval_step


def run_trainer_check(n_devices: int, batch_size: Optional[int] = None,
                      accum_steps: int = 2, compare_single: bool = True,
                      res: int = 32, n_views: int = 2, verbose: bool = True,
                      spec=None):
    """One sharded train step + eval step on an n-device mesh.

    With ``compare_single``, reruns both on a 1-device mesh and asserts the
    losses (and a parameter-update norm) agree — the SPMD invariant.
    ``spec`` overrides the model (tests pass :func:`toy_model_spec` to keep
    CPU compiles fast; the driver dryrun uses the real flagship model).
    Returns a dict of scalars for the caller to record."""
    import jax

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.train.trainer import data_mesh, replicate, shard_batch

    if spec is None:
        spec = load_model_spec(_MODEL, align_symmetry=False)
    if batch_size is None:
        batch_size = n_devices * max(1, accum_steps)
    assert batch_size % (n_devices * accum_steps) == 0

    variables, tx, train_step, eval_step = _build_setup(spec, n_views, res, accum_steps)
    params0 = variables["params"]
    stats0 = variables.get("batch_stats", {})
    batch_np = synthetic_multiview_batch(spec, batch_size, n_views, res)

    def run_on(n):
        mesh = data_mesh(n)
        params = replicate(mesh, params0)
        stats = replicate(mesh, stats0)
        opt_state = replicate(mesh, tx.init(params0))
        batch = shard_batch(mesh, batch_np)
        # sanity: inputs really are sharded over the mesh
        assert len(batch["images"].sharding.device_set) == n
        new_params, new_stats, opt_state, loss, objs = train_step(
            params, stats, opt_state, batch
        )
        eval_loss, _ = eval_step(params, stats, batch)
        import optax

        upd = optax.global_norm(jax.tree.map(lambda a, b: a - b, new_params, params))
        return float(loss), float(eval_loss), float(upd), objs

    loss_n, eval_n, upd_n, objs = run_on(n_devices)
    assert np.isfinite(loss_n) and np.isfinite(eval_n), "non-finite sharded loss"
    result = {"n_devices": n_devices, "loss": loss_n, "eval_loss": eval_n,
              "update_norm": upd_n,
              "components": {k: float(v) for k, v in objs.items()}}

    if compare_single:
        loss_1, eval_1, upd_1, _ = run_on(1)
        np.testing.assert_allclose(loss_n, loss_1, rtol=2e-5,
                                   err_msg="sharded train loss != single-device")
        np.testing.assert_allclose(eval_n, eval_1, rtol=2e-5,
                                   err_msg="sharded eval loss != single-device")
        np.testing.assert_allclose(upd_n, upd_1, rtol=2e-4,
                                   err_msg="sharded param update != single-device")
        result.update(loss_single=loss_1, eval_single=eval_1)
    if verbose:
        print(f"multidevice trainer check ({n_devices} devices): "
              f"loss={loss_n:.6f} eval={eval_n:.6f} upd={upd_n:.4e} OK")
    return result


def main():
    """Run with virtual devices:

      JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python -m smilify_tpu.train.multidevice 8

    (JAX_PLATFORM_NAME, not JAX_PLATFORMS — the latter is ignored by this jax
    build; and `python -m` imports the package, which touches jax, before this
    function could call jax.config.update.)"""
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    run_trainer_check(n)


if __name__ == "__main__":
    main()
