"""PointNet/PointNet++ registration (reference fitter_3d/pointcloud2smil/):
forward shapes, self-supervised sampling, loss sanity, and a short training
run that actually reduces the loss."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy():
    from smilify_tpu.train.multidevice import toy_model_spec

    return toy_model_spec()


def test_pointnet_forward_shapes(toy):
    import jax
    import jax.numpy as jnp

    from smilify_tpu.models.pointnet import PointNetConfig, SMILPointNet

    spec = toy
    for arch in ("pointnet", "pointnet2"):
        cfg = PointNetConfig(arch=arch, n_pose=spec.n_joints - 1,
                             n_betas=spec.n_betas, n_joints=spec.n_joints,
                             head_hidden=64)
        model = SMILPointNet(cfg)
        clouds = jnp.asarray(np.random.RandomState(0).randn(2, 512, 3), jnp.float32)
        out = model.init_with_output(jax.random.PRNGKey(0), clouds)[0]
        assert out["global_rot"].shape == (2, 6)
        assert out["joint_rot"].shape == (2, (spec.n_joints - 1) * 6)
        assert out["betas"].shape == (2, spec.n_betas)
        # zero-init heads + identity bias → identity 6D at init
        np.testing.assert_allclose(np.asarray(out["global_rot"][0]),
                                   [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_selfsupervised_sampling_and_loss(toy):
    import jax
    import jax.numpy as jnp

    from smilify_tpu.models.pointnet import (
        PointNetConfig, clouds_from_params, pointnet_loss, sample_smil_configs,
    )

    spec = toy
    cfg = PointNetConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas,
                         n_joints=spec.n_joints, predict_scales=False)
    key = jax.random.PRNGKey(0)
    params = sample_smil_configs(spec, 3, key, pose_scale=0.1, beta_scale=0.3)
    clouds, gt_joints = clouds_from_params(spec, params, n_points=256, key=key)
    assert clouds.shape == (3, 256, 3)
    assert np.isfinite(np.asarray(clouds)).all()

    # GT-consistency: raw outputs matching the sampled params give near-zero
    # parameter losses
    from smilify_tpu.core.rotations import axis_angle_to_rotation_6d

    raw = {
        "global_rot": axis_angle_to_rotation_6d(params["global_rot"]),
        "joint_rot": axis_angle_to_rotation_6d(params["joint_rot"]).reshape(3, -1),
        "betas": params["betas"],
        "trans": params["trans"],
    }
    total, objs = pointnet_loss(spec, cfg, raw, params, gt_joints, clouds)
    assert float(total) < 1e-3, {k: float(v) for k, v in objs.items()}


@pytest.mark.slow
def test_pointnet_training_reduces_loss(toy, tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from smilify_tpu.models.pointnet import (
        PointNetConfig, SMILPointNet, clouds_from_params, pointnet_loss,
        sample_smil_configs,
    )

    spec = toy
    cfg = PointNetConfig(n_pose=spec.n_joints - 1, n_betas=spec.n_betas,
                         n_joints=spec.n_joints, head_hidden=64, predict_scales=False)
    model = SMILPointNet(cfg)
    key = jax.random.PRNGKey(0)
    params0 = sample_smil_configs(spec, 4, key, pose_scale=0.05, beta_scale=0.2)
    clouds, gt_joints = clouds_from_params(spec, params0, n_points=256, key=key)
    variables = model.init(key, clouds)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            raw = model.apply({"params": p}, clouds)
            total, _ = pointnet_loss(spec, cfg, raw, params0, gt_joints, clouds)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    p = variables["params"]
    losses = []
    for _ in range(30):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
