"""Pretrained-backbone weight porting (torch → flax).

The reference uses torchvision/timm pretrained backbones; this environment has
no network access and no torchvision/timm, so porting is a two-step offline
flow:

1. On a machine with torch + torchvision/timm, dump a state dict to npz:
     python -m smilify_tpu.models.weight_port dump --arch resnet50 --out r50.npz
   (or save any ``{name: tensor}`` dict with numpy — the converter only needs
   the standard parameter names.)
2. Here, convert + load:
     params = load_ported_resnet(npz_path, flax_params)
     params = load_ported_vit(npz_path, flax_params)

Conversions: conv kernels OIHW→HWIO, linear kernels transpose, batchnorm
weight/bias/running_* → scale/bias/mean/var; ViT qkv splits into flax's
separate query/key/value heads.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w):  # OIHW → HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # (out, in) → (in, out)
    return np.transpose(w)


def _resnet_block_layout(sd) -> tuple:
    """(flax block prefix, convs per block) from the torch state-dict names:
    Bottleneck (conv1..3, resnet50/101/152) vs BasicBlock (conv1..2,
    resnet18/34 — the UNet encoder)."""
    if "layer1.0.conv3.weight" in sd:
        return "Bottleneck", 3
    return "BasicBlock", 2


def load_ported_resnet(npz_path: str, flax_params: Dict) -> Dict:
    """Map torchvision ResNet-v1 names onto our ResNet/ResNet34Encoder tree.

    Our module tree: Conv_0/BatchNorm_0 stem; Bottleneck_{i} (Conv_0..2 +
    Conv_3/BatchNorm_3 downsample) or BasicBlock_{i} (Conv_0..1 +
    Conv_2/BatchNorm_2 downsample) blocks in stage order.
    """
    import jax

    sd = dict(np.load(npz_path))
    params = jax.tree_util.tree_map(lambda x: x, flax_params)  # copy
    block_name, n_convs = _resnet_block_layout(sd)

    # stem
    params["Conv_0"]["kernel"] = _conv(sd["conv1.weight"])
    bn = params["BatchNorm_0"]
    bn["scale"] = sd["bn1.weight"]
    bn["bias"] = sd["bn1.bias"]

    # blocks: torchvision names layer{L}.{b}.conv{k}/bn{k} + downsample
    block_idx = 0
    L = 1
    while f"layer{L}.0.conv1.weight" in sd:
        b = 0
        while f"layer{L}.{b}.conv1.weight" in sd:
            prefix = f"layer{L}.{b}"
            blk = params[f"{block_name}_{block_idx}"]
            for k in range(1, n_convs + 1):
                blk[f"Conv_{k-1}"]["kernel"] = _conv(sd[f"{prefix}.conv{k}.weight"])
                blk[f"BatchNorm_{k-1}"]["scale"] = sd[f"{prefix}.bn{k}.weight"]
                blk[f"BatchNorm_{k-1}"]["bias"] = sd[f"{prefix}.bn{k}.bias"]
            if f"{prefix}.downsample.0.weight" in sd:
                blk[f"Conv_{n_convs}"]["kernel"] = _conv(sd[f"{prefix}.downsample.0.weight"])
                blk[f"BatchNorm_{n_convs}"]["scale"] = sd[f"{prefix}.downsample.1.weight"]
                blk[f"BatchNorm_{n_convs}"]["bias"] = sd[f"{prefix}.downsample.1.bias"]
            block_idx += 1
            b += 1
        L += 1
    return params


def port_resnet_batch_stats(npz_path: str, flax_batch_stats: Dict) -> Dict:
    import jax

    sd = dict(np.load(npz_path))
    stats = jax.tree_util.tree_map(lambda x: x, flax_batch_stats)
    block_name, n_convs = _resnet_block_layout(sd)
    stats["BatchNorm_0"]["mean"] = sd["bn1.running_mean"]
    stats["BatchNorm_0"]["var"] = sd["bn1.running_var"]
    block_idx = 0
    L = 1
    while f"layer{L}.0.bn1.running_mean" in sd:
        b = 0
        while f"layer{L}.{b}.bn1.running_mean" in sd:
            prefix = f"layer{L}.{b}"
            blk = stats[f"{block_name}_{block_idx}"]
            for k in range(1, n_convs + 1):
                blk[f"BatchNorm_{k-1}"]["mean"] = sd[f"{prefix}.bn{k}.running_mean"]
                blk[f"BatchNorm_{k-1}"]["var"] = sd[f"{prefix}.bn{k}.running_var"]
            if f"{prefix}.downsample.1.running_mean" in sd:
                blk[f"BatchNorm_{n_convs}"]["mean"] = sd[f"{prefix}.downsample.1.running_mean"]
                blk[f"BatchNorm_{n_convs}"]["var"] = sd[f"{prefix}.downsample.1.running_var"]
            block_idx += 1
            b += 1
        L += 1
    return stats


def _effnet_block_layers(sd, prefix: str):
    """(flax submodule name, kind) pairs for one timm generic-builder block —
    DepthwiseSeparableConv (ds), InvertedResidual (ir), or ConvBnAct (cn,
    mobilenetv3's final 960-ch block). SE is optional (mobilenetv3 omits it
    on the relu/no-SE stages)."""
    has_se = f"{prefix}.se.conv_reduce.weight" in sd
    if f"{prefix}.conv.weight" in sd:  # ConvBnAct
        return (("conv", "conv"), ("bn1", "bn"))
    if f"{prefix}.conv_pwl.weight" in sd:  # InvertedResidual
        layers = [("conv_pw", "conv"), ("bn1", "bn"), ("conv_dw", "conv"), ("bn2", "bn")]
        if has_se:
            layers.append(("se", "se"))
        return tuple(layers) + (("conv_pwl", "conv"), ("bn3", "bn"))
    layers = [("conv_dw", "conv"), ("bn1", "bn")]
    if has_se:
        layers.append(("se", "se"))
    return tuple(layers) + (("conv_pw", "conv"), ("bn2", "bn"))


def _set_checked(dst: Dict, leaf: str, value, src_key: str) -> None:
    """Assign with a shape gate: a silent broadcast/reshape here would defer
    any layout mismatch (e.g. SE reduced-channel rounding on scaled widths)
    to an opaque apply-time error far from the offending key."""
    have = tuple(np.shape(dst[leaf]))
    want = tuple(np.shape(value))
    if have != want:
        raise ValueError(
            f"ported weight shape mismatch at '{src_key}' -> '{leaf}': "
            f"checkpoint {want} vs model {have}"
        )
    dst[leaf] = value


def load_ported_efficientnet(npz_path: str, flax_params: Dict) -> Dict:
    """Map timm efficientnet_b0/b3/b5 names (conv_stem/bn1/blocks.{s}.{b}.*)
    onto our :class:`~smilify_tpu.models.backbones.EfficientNetEncoder` tree
    (submodules are named blocks_{s}_{b} with timm-matching layer names).

    Every assignment is shape-checked so a real timm checkpoint whose widths
    diverge from our replica (see tools/gen_backbone_fixtures.py — the parity
    fixtures are generated from a hand-rolled timm-compatible replica, so a
    one-time spot check against a real timm state dict is still owed) fails
    loudly with the offending key name."""
    import jax

    sd = dict(np.load(npz_path))
    params = jax.tree_util.tree_map(lambda x: x, flax_params)

    _set_checked(params["conv_stem"], "kernel", _conv(sd["conv_stem.weight"]), "conv_stem.weight")
    _set_checked(params["bn1"], "scale", sd["bn1.weight"], "bn1.weight")
    _set_checked(params["bn1"], "bias", sd["bn1.bias"], "bn1.bias")

    for name in list(params):
        if not name.startswith("blocks_"):
            continue
        s, b = name.split("_")[1:]
        prefix = f"blocks.{s}.{b}"
        blk = params[name]
        for layer, kind in _effnet_block_layers(sd, prefix):
            if kind == "conv":
                key = f"{prefix}.{layer}.weight"
                _set_checked(blk[layer], "kernel", _conv(sd[key]), key)
            elif kind == "bn":
                _set_checked(blk[layer], "scale", sd[f"{prefix}.{layer}.weight"],
                             f"{prefix}.{layer}.weight")
                _set_checked(blk[layer], "bias", sd[f"{prefix}.{layer}.bias"],
                             f"{prefix}.{layer}.bias")
            else:  # se
                for se_conv in ("conv_reduce", "conv_expand"):
                    key = f"{prefix}.se.{se_conv}"
                    _set_checked(blk["se"][se_conv], "kernel", _conv(sd[f"{key}.weight"]),
                                 f"{key}.weight")
                    _set_checked(blk["se"][se_conv], "bias", sd[f"{key}.bias"], f"{key}.bias")
    return params


def port_efficientnet_batch_stats(npz_path: str, flax_batch_stats: Dict) -> Dict:
    import jax

    sd = dict(np.load(npz_path))
    stats = jax.tree_util.tree_map(lambda x: x, flax_batch_stats)
    stats["bn1"]["mean"] = sd["bn1.running_mean"]
    stats["bn1"]["var"] = sd["bn1.running_var"]
    for name in list(stats):
        if not name.startswith("blocks_"):
            continue
        s, b = name.split("_")[1:]
        prefix = f"blocks.{s}.{b}"
        for layer, kind in _effnet_block_layers(sd, prefix):
            if kind == "bn":
                stats[name][layer]["mean"] = sd[f"{prefix}.{layer}.running_mean"]
                stats[name][layer]["var"] = sd[f"{prefix}.{layer}.running_var"]
    return stats


def load_ported_convnext(npz_path: str, flax_params: Dict) -> Dict:
    """Map timm convnext names (stem.{0,1}, stages.{s}.downsample.{0,1},
    stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}) onto our
    :class:`~smilify_tpu.models.backbones.ConvNeXtEncoder` tree. LayerNorm
    only — no batch statistics to port. Every assignment is shape-checked
    (same rationale as the efficientnet loader)."""
    import jax

    sd = dict(np.load(npz_path))
    params = jax.tree_util.tree_map(lambda x: x, flax_params)

    _set_checked(params["stem_conv"], "kernel", _conv(sd["stem.0.weight"]), "stem.0.weight")
    _set_checked(params["stem_conv"], "bias", sd["stem.0.bias"], "stem.0.bias")
    _set_checked(params["stem_norm"], "scale", sd["stem.1.weight"], "stem.1.weight")
    _set_checked(params["stem_norm"], "bias", sd["stem.1.bias"], "stem.1.bias")

    for name in list(params):
        if name.startswith("stages_") and name.endswith("_downsample_norm"):
            s = name.split("_")[1]
            _set_checked(params[name], "scale", sd[f"stages.{s}.downsample.0.weight"],
                         f"stages.{s}.downsample.0.weight")
            _set_checked(params[name], "bias", sd[f"stages.{s}.downsample.0.bias"],
                         f"stages.{s}.downsample.0.bias")
        elif name.startswith("stages_") and name.endswith("_downsample_conv"):
            s = name.split("_")[1]
            _set_checked(params[name], "kernel", _conv(sd[f"stages.{s}.downsample.1.weight"]),
                         f"stages.{s}.downsample.1.weight")
            _set_checked(params[name], "bias", sd[f"stages.{s}.downsample.1.bias"],
                         f"stages.{s}.downsample.1.bias")
        elif name.startswith("stages_") and "_blocks_" in name:
            s, b = name.split("_")[1], name.split("_")[3]
            prefix = f"stages.{s}.blocks.{b}"
            blk = params[name]
            _set_checked(blk["conv_dw"], "kernel", _conv(sd[f"{prefix}.conv_dw.weight"]),
                         f"{prefix}.conv_dw.weight")
            _set_checked(blk["conv_dw"], "bias", sd[f"{prefix}.conv_dw.bias"],
                         f"{prefix}.conv_dw.bias")
            _set_checked(blk["norm"], "scale", sd[f"{prefix}.norm.weight"],
                         f"{prefix}.norm.weight")
            _set_checked(blk["norm"], "bias", sd[f"{prefix}.norm.bias"],
                         f"{prefix}.norm.bias")
            _set_checked(blk["mlp_fc1"], "kernel", _lin(sd[f"{prefix}.mlp.fc1.weight"]),
                         f"{prefix}.mlp.fc1.weight")
            _set_checked(blk["mlp_fc1"], "bias", sd[f"{prefix}.mlp.fc1.bias"],
                         f"{prefix}.mlp.fc1.bias")
            _set_checked(blk["mlp_fc2"], "kernel", _lin(sd[f"{prefix}.mlp.fc2.weight"]),
                         f"{prefix}.mlp.fc2.weight")
            _set_checked(blk["mlp_fc2"], "bias", sd[f"{prefix}.mlp.fc2.bias"],
                         f"{prefix}.mlp.fc2.bias")
            _set_checked(blk, "gamma", sd[f"{prefix}.gamma"], f"{prefix}.gamma")
    return params


def load_ported_unet_encoder(npz_path: str, flax_params: Dict,
                             flax_batch_stats: Dict) -> tuple:
    """Port a torchvision resnet34/resnet50 or timm efficientnet_b0/b3/b5 /
    mobilenetv3_large_100 / convnext_base dump into the ``encoder`` subtree
    of a :class:`~smilify_tpu.models.backbones.UNetResNet` variable tree; the
    skip decoder stays at its fresh init (the reference's timm-encoder UNets
    are exactly this: pretrained encoder + random decoder,
    ``backbone_factory.py:319-514``). The encoder family is auto-detected from
    the dump's key names. Returns (params, batch_stats)."""
    sd_keys = np.load(npz_path).files
    params = dict(flax_params)
    stats = dict(flax_batch_stats)
    if "stem.0.weight" in sd_keys:  # timm convnext (LayerNorm-only: no stats)
        params["encoder"] = load_ported_convnext(npz_path, flax_params["encoder"])
    elif "conv_stem.weight" in sd_keys:  # timm efficientnet / mobilenetv3
        params["encoder"] = load_ported_efficientnet(npz_path, flax_params["encoder"])
        stats["encoder"] = port_efficientnet_batch_stats(npz_path, flax_batch_stats["encoder"])
    else:
        params["encoder"] = load_ported_resnet(npz_path, flax_params["encoder"])
        stats["encoder"] = port_resnet_batch_stats(npz_path, flax_batch_stats["encoder"])
    return params, stats


def load_ported_vit(npz_path: str, flax_params: Dict) -> Dict:
    """Map timm ViT names onto our ViT module tree (TransformerBlock_{i})."""
    import jax

    sd = dict(np.load(npz_path))
    params = jax.tree_util.tree_map(lambda x: x, flax_params)

    params["patch_embed"]["kernel"] = _conv(sd["patch_embed.proj.weight"])
    params["patch_embed"]["bias"] = sd["patch_embed.proj.bias"]
    params["cls_token"] = sd["cls_token"].reshape(params["cls_token"].shape)
    pos = sd["pos_embed"]
    if pos.shape != params["pos_embed"].shape:
        raise ValueError(f"pos_embed shape mismatch {pos.shape} vs {params['pos_embed'].shape} "
                         "(different input resolution — interpolate offline)")
    params["pos_embed"] = pos
    params["norm"]["scale"] = sd["norm.weight"]
    params["norm"]["bias"] = sd["norm.bias"]

    i = 0
    while f"blocks.{i}.attn.qkv.weight" in sd:
        blk = params[f"TransformerBlock_{i}"]
        dim = sd[f"blocks.{i}.attn.qkv.weight"].shape[1]
        heads = blk["MultiHeadDotProductAttention_0"]["query"]["kernel"].shape[1]
        head_dim = dim // heads
        qkv_w = sd[f"blocks.{i}.attn.qkv.weight"]  # (3*dim, dim)
        qkv_b = sd[f"blocks.{i}.attn.qkv.bias"]
        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * dim : (j + 1) * dim].T.reshape(dim, heads, head_dim)
            b = qkv_b[j * dim : (j + 1) * dim].reshape(heads, head_dim)
            blk["MultiHeadDotProductAttention_0"][name]["kernel"] = w
            blk["MultiHeadDotProductAttention_0"][name]["bias"] = b
        proj_w = sd[f"blocks.{i}.attn.proj.weight"]  # (dim, dim)
        blk["MultiHeadDotProductAttention_0"]["out"]["kernel"] = proj_w.T.reshape(heads, head_dim, dim)
        blk["MultiHeadDotProductAttention_0"]["out"]["bias"] = sd[f"blocks.{i}.attn.proj.bias"]
        blk["LayerNorm_0"]["scale"] = sd[f"blocks.{i}.norm1.weight"]
        blk["LayerNorm_0"]["bias"] = sd[f"blocks.{i}.norm1.bias"]
        blk["LayerNorm_1"]["scale"] = sd[f"blocks.{i}.norm2.weight"]
        blk["LayerNorm_1"]["bias"] = sd[f"blocks.{i}.norm2.bias"]
        blk["Dense_0"]["kernel"] = _lin(sd[f"blocks.{i}.mlp.fc1.weight"])
        blk["Dense_0"]["bias"] = sd[f"blocks.{i}.mlp.fc1.bias"]
        blk["Dense_1"]["kernel"] = _lin(sd[f"blocks.{i}.mlp.fc2.weight"])
        blk["Dense_1"]["bias"] = sd[f"blocks.{i}.mlp.fc2.bias"]
        i += 1
    return params


def load_pretrained_into_variables(npz_path: str, backbone_name: str,
                                   params: Dict, batch_stats: Dict):
    """Route a ported torch dump into the backbone subtree of a regressor
    parameter tree (the subtree is the auto-named ResNet_*/ViT_* module).

    Returns (params, batch_stats) with the backbone weights replaced.
    """
    key = next((k for k in params if k.startswith(("ResNet", "ViT", "UNet"))), None)
    if key is None:
        raise ValueError(f"no backbone subtree found among {sorted(params)}")
    if backbone_name.startswith("resnet"):
        params = dict(params)
        params[key] = load_ported_resnet(npz_path, params[key])
        batch_stats = dict(batch_stats)
        batch_stats[key] = port_resnet_batch_stats(npz_path, batch_stats[key])
    elif backbone_name.startswith("vit"):
        params = dict(params)
        params[key] = load_ported_vit(npz_path, params[key])
    elif backbone_name in ("unet_resnet34", "unet_resnet50", "unet_efficientnet_b0",
                           "unet_efficientnet_b3", "unet_efficientnet_b5",
                           "unet_convnext_base", "unet_mobilenet_v3"):
        params, batch_stats = dict(params), dict(batch_stats)
        params[key], batch_stats[key] = load_ported_unet_encoder(
            npz_path, params[key], batch_stats[key]
        )
    else:
        raise ValueError(
            f"no torch weight source exists for backbone '{backbone_name}' — "
            "the hand-rolled UNet variants (unet_small/unet_micro) train from "
            "scratch; the unet_* ported-encoder variants take torchvision "
            "resnet34/resnet50 or timm efficientnet_b0/b3/b5 / "
            "mobilenetv3_large_100 / convnext_base dumps"
        )
    return params, batch_stats


def apply_pretrained_policy(cfg, params: Dict, batch_stats: Dict,
                            allow_random_backbone: bool = False):
    """Trainer-side policy (reference default workflow trains a *frozen
    pretrained* backbone, ``backbone_factory.py:105-118``): load
    ``model.pretrained_npz`` when set; otherwise refuse to train a frozen
    random encoder unless explicitly allowed."""
    if cfg.model.pretrained_npz:
        params, batch_stats = load_pretrained_into_variables(
            cfg.model.pretrained_npz, cfg.model.backbone_name, params, batch_stats
        )
        print(f"loaded pretrained backbone weights from {cfg.model.pretrained_npz}")
    elif cfg.model.freeze_backbone and cfg.model.backbone_unfreeze_epoch is None \
            and not allow_random_backbone:
        raise SystemExit(
            "model.freeze_backbone=true with no model.pretrained_npz would train "
            "a frozen RANDOM encoder. Set model.pretrained_npz (see "
            "smilify_tpu/models/weight_port.py), set freeze_backbone=false, or "
            "pass --allow-random-backbone."
        )
    return params, batch_stats


def _dump_cli():
    """Dump a torchvision/timm state dict to npz (run where torch exists)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["dump"])
    ap.add_argument("--arch", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    if args.arch.startswith("resnet"):
        import torchvision.models as tvm

        model = getattr(tvm, args.arch)(weights="IMAGENET1K_V2")
    else:
        import timm

        model = timm.create_model(args.arch, pretrained=True)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(args.out, **sd)
    print(f"dumped {len(sd)} tensors → {args.out}")


if __name__ == "__main__":
    _dump_cli()
