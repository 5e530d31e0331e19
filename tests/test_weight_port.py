"""Torch→Flax backbone weight-port parity.

A subprocess builds randomly-initialized torch models with torchvision/timm
architectures + state-dict naming (``tools/gen_backbone_fixtures.py`` — torch
and jax cannot share a process on this box), the port converts the dumped
state dict, and the Flax forward must match the torch forward ≤ 1e-4. This
validates the offline pretrained-weight flow of the reference
(``neuralSMIL/backbone_factory.py:105-118``, ``hpc_files/download_backbone_weights.py``).

Backend note: TPU's default matmul/conv precision is bf16-class, so the tight
parity check runs under ``jax.default_matmul_precision("highest")`` (f32 on
CPU, 6-pass bf16 emulation on TPU — same ≤1e-4 bound on both backends). A
second assertion validates the *default*-precision path against an explicit
bf16-class tolerance, so the fast TPU path is tested rather than skipped.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("backbone_port")


def _gen(arch, out):
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_backbone_fixtures.py"), arch, str(out)],
        check=True, cwd=REPO, capture_output=True, text=True,
    )


def test_resnet50_port_parity(fixture_dir):
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import ResNet
    from smilify_tpu.models.weight_port import load_ported_resnet, port_resnet_batch_stats

    npz = fixture_dir / "resnet50.npz"
    _gen("resnet50", npz)
    fx = dict(np.load(npz))

    x = jnp.asarray(fx["__input__"].transpose(0, 2, 3, 1))  # NCHW → NHWC, [0,1]
    model = ResNet([3, 4, 6, 3], dtype=jnp.float32)
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=False)

    params = load_ported_resnet(str(npz), variables["params"])
    stats = port_resnet_batch_stats(str(npz), variables["batch_stats"])
    import jax

    want = fx["__pooled__"]
    scale = max(1e-3, float(np.abs(want).max()))

    with jax.default_matmul_precision("highest"):
        feats = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(feats.pooled), want,
                               atol=1e-4 * scale + 1e-5, rtol=1e-4)

    # default (fast) precision: bf16-class accumulation on TPU → ~3e-2 bound
    feats_fast = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(feats_fast.pooled), want,
                               atol=3e-2 * scale, rtol=3e-2)


def test_frozen_random_backbone_refused():
    """freeze_backbone=true + no pretrained_npz must refuse to train (the
    reference default workflow is a frozen *pretrained* encoder)."""
    from smilify_tpu.models.weight_port import apply_pretrained_policy
    from smilify_tpu.train.config import load_config

    cfg = load_config(None, overrides={
        "model.freeze_backbone": True, "model.backbone_unfreeze_epoch": None,
    }, mode="single_view")
    with pytest.raises(SystemExit):
        apply_pretrained_policy(cfg, {"ResNet_0": {}}, {})
    # explicit opt-out works
    p, s = apply_pretrained_policy(cfg, {"ResNet_0": {}}, {}, allow_random_backbone=True)
    assert p == {"ResNet_0": {}}


@pytest.mark.slow
@pytest.mark.parametrize("arch,sizes", [("resnet101", [3, 4, 23, 3]),
                                        ("resnet152", [3, 8, 36, 3])])
def test_deep_resnet_port_parity(fixture_dir, arch, sizes):
    """The deeper reference ResNets (101/152, backbone_factory.py:500-514) go
    through the same generic converter — proven per variant, not assumed."""
    import jax
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import ResNet
    from smilify_tpu.models.weight_port import load_ported_resnet, port_resnet_batch_stats

    npz = fixture_dir / f"{arch}.npz"
    _gen(arch, npz)
    fx = dict(np.load(npz))

    x = jnp.asarray(fx["__input__"].transpose(0, 2, 3, 1))
    model = ResNet(sizes, dtype=jnp.float32)
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=False)
    params = load_ported_resnet(str(npz), variables["params"])
    stats = port_resnet_batch_stats(str(npz), variables["batch_stats"])

    want = fx["__pooled__"]
    scale = max(1e-3, float(np.abs(want).max()))
    with jax.default_matmul_precision("highest"):
        feats = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(feats.pooled), want,
                               atol=1e-4 * scale + 1e-5, rtol=1e-4)
    feats_fast = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(feats_fast.pooled), want,
                               atol=3e-2 * scale, rtol=3e-2)


@pytest.mark.parametrize(
    "arch", ["resnet34_encoder", "resnet50_encoder", "efficientnet_b0_encoder",
             "efficientnet_b3_encoder", "mobilenetv3_encoder",
             pytest.param("efficientnet_b5_encoder", marks=pytest.mark.slow),
             pytest.param("convnext_encoder", marks=pytest.mark.slow)]
)
def test_unet_encoder_port_parity(fixture_dir, arch):
    """The ported-encoder UNets (resnet34/resnet50, efficientnet_b0/b3/b5,
    mobilenetv3_large_100, convnext_base — the COMPLETE 7-entry reference
    _ENCODER_MAP, backbone_factory.py:337-345) port from torchvision/timm
    dumps and reproduce every skip-stage feature map. The decoder stays
    fresh, so parity is asserted per stage, not on the full UNet forward.
    ConvNeXt yields 4 stages (no stride-2 feature); the rest yield 5."""
    import jax
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import (
        EFFICIENTNET_VARIANTS,
        ConvNeXtEncoder,
        EfficientNetEncoder,
        MobileNetV3Encoder,
        ResNetEncoder,
        normalize_imagenet,
    )
    from smilify_tpu.models.weight_port import (
        load_ported_convnext,
        load_ported_efficientnet,
        load_ported_resnet,
        port_efficientnet_batch_stats,
        port_resnet_batch_stats,
    )

    npz = fixture_dir / f"{arch}.npz"
    _gen(arch, npz)
    fx = dict(np.load(npz))

    x = normalize_imagenet(jnp.asarray(fx["__input__"].transpose(0, 2, 3, 1)))
    n_stages = 5
    load_params, load_stats = load_ported_resnet, port_resnet_batch_stats
    if arch.startswith("efficientnet_"):
        stem, stage_cfg, _ = EFFICIENTNET_VARIANTS[arch[: -len("_encoder")]]
        model = EfficientNetEncoder(stem_ch=stem, stages=stage_cfg, dtype=jnp.float32)
        load_params, load_stats = load_ported_efficientnet, port_efficientnet_batch_stats
    elif arch == "mobilenetv3_encoder":
        model = MobileNetV3Encoder(dtype=jnp.float32)
        load_params, load_stats = load_ported_efficientnet, port_efficientnet_batch_stats
    elif arch == "convnext_encoder":
        model = ConvNeXtEncoder(dtype=jnp.float32)
        load_params, load_stats, n_stages = load_ported_convnext, None, 4
    else:
        block = "basic" if arch == "resnet34_encoder" else "bottleneck"
        model = ResNetEncoder(block=block, dtype=jnp.float32)
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=False)
    params = load_params(str(npz), variables["params"])
    apply_vars = {"params": params}
    if load_stats is not None:
        apply_vars["batch_stats"] = load_stats(str(npz), variables["batch_stats"])

    with jax.default_matmul_precision("highest"):
        stages = model.apply(apply_vars, x, train=False)
    assert len(stages) == n_stages
    for i, got in enumerate(stages):
        want = fx[f"__stage{i}__"]
        scale = max(1e-3, float(np.abs(want).max()))
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=1e-4 * scale + 1e-5, rtol=1e-4,
                                   err_msg=f"stage {i}")


@pytest.mark.parametrize(
    "backbone,arch,pooled_dim",
    [("unet_resnet34", "resnet34_encoder", 512),
     ("unet_resnet50", "resnet50_encoder", 2048),
     ("unet_efficientnet_b0", "efficientnet_b0_encoder", 320),
     ("unet_mobilenet_v3", "mobilenetv3_encoder", 960),
     pytest.param("unet_convnext_base", "convnext_encoder", 1024,
                  marks=pytest.mark.slow)],
)
def test_unet_pretrained_npz_route(fixture_dir, backbone, arch, pooled_dim):
    """model.pretrained_npz works for the UNet variants end-to-end: the policy
    routes a resnet34/resnet50 dump into the UNetResNet encoder subtree, the
    decoder keeps its init, and the ported model still runs."""
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import create_backbone
    from smilify_tpu.models.weight_port import load_pretrained_into_variables

    npz = fixture_dir / f"{arch}.npz"
    if not npz.exists():
        _gen(arch, npz)
    fx = dict(np.load(npz))

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    model, dim = create_backbone(backbone, dtype=jnp.float32)
    assert dim == pooled_dim
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=False)
    params = {"UNetResNet_0": variables["params"]}
    stats = {"UNetResNet_0": variables["batch_stats"]}

    params, stats = load_pretrained_into_variables(
        str(npz), backbone, params, stats)
    # encoder stem really is the torch stem conv weight
    if "stem.0.weight" in fx:  # timm convnext naming
        got = np.asarray(params["UNetResNet_0"]["encoder"]["stem_conv"]["kernel"])
        want = fx["stem.0.weight"]
    elif "conv_stem.weight" in fx:  # timm efficientnet/mobilenetv3 naming
        got = np.asarray(params["UNetResNet_0"]["encoder"]["conv_stem"]["kernel"])
        want = fx["conv_stem.weight"]
    else:
        got = np.asarray(params["UNetResNet_0"]["encoder"]["Conv_0"]["kernel"])
        want = fx["conv1.weight"]
    np.testing.assert_array_equal(got, want.transpose(2, 3, 1, 0))
    # ported variables still drive the full UNet forward
    feats = model.apply(
        {"params": params["UNetResNet_0"], "batch_stats": stats["UNetResNet_0"]},
        x, train=False)
    assert np.isfinite(np.asarray(feats.pooled)).all()
    assert feats.pooled.shape == (1, pooled_dim)


@pytest.mark.slow
def test_vit_large_port_parity(fixture_dir):
    """The reference's FLAGSHIP benchmark backbone
    (GETTING_STARTED.md:40-95: ViT-Large multi-view) ports with forward
    parity — closing the round-3 gap where only vit_base had fixtures."""
    import jax
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import ViT
    from smilify_tpu.models.weight_port import load_ported_vit

    npz = fixture_dir / "vit_large.npz"
    _gen("vit_large", npz)
    fx = dict(np.load(npz))

    x = jnp.asarray(fx["__input__"].transpose(0, 2, 3, 1))
    model = ViT(24, 1024, 16, dtype=jnp.float32)
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=False)
    params = load_ported_vit(str(npz), variables["params"])

    with jax.default_matmul_precision("highest"):
        feats = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(feats.pooled), fx["__pooled__"], atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(feats.tokens), fx["__tokens__"], atol=1e-4, rtol=1e-3
    )
    feats_fast = model.apply({"params": params}, x, train=False)
    tok_scale = max(1e-3, float(np.abs(fx["__tokens__"]).max()))
    np.testing.assert_allclose(
        np.asarray(feats_fast.pooled), fx["__pooled__"], atol=3e-2, rtol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(feats_fast.tokens), fx["__tokens__"],
        atol=3e-2 * tok_scale, rtol=3e-2
    )


@pytest.mark.slow
def test_vit_base_port_parity(fixture_dir):
    import jax.numpy as jnp

    from smilify_tpu.models.backbones import ViT
    from smilify_tpu.models.weight_port import load_ported_vit

    npz = fixture_dir / "vit_base.npz"
    _gen("vit_base", npz)
    fx = dict(np.load(npz))

    x = jnp.asarray(fx["__input__"].transpose(0, 2, 3, 1))
    model = ViT(12, 768, 12, dtype=jnp.float32)
    variables = model.init({"params": jnp.zeros(2, jnp.uint32)}, x, train=False)

    params = load_ported_vit(str(npz), variables["params"])
    import jax

    with jax.default_matmul_precision("highest"):
        feats = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(feats.pooled), fx["__pooled__"], atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(feats.tokens), fx["__tokens__"], atol=1e-4, rtol=1e-3
    )

    # default (fast) precision: bf16-class bound
    feats_fast = model.apply({"params": params}, x, train=False)
    tok_scale = max(1e-3, float(np.abs(fx["__tokens__"]).max()))
    np.testing.assert_allclose(
        np.asarray(feats_fast.pooled), fx["__pooled__"], atol=3e-2, rtol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(feats_fast.tokens), fx["__tokens__"], atol=3e-2 * tok_scale, rtol=3e-2
    )
