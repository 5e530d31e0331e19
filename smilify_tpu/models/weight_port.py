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
    """(flax submodule name, torch key, kind) triples for one timm effnet
    block — DepthwiseSeparableConv (stage 0) vs InvertedResidual layouts."""
    if f"{prefix}.conv_pwl.weight" in sd:  # InvertedResidual
        return (
            ("conv_pw", "conv"), ("bn1", "bn"), ("conv_dw", "conv"), ("bn2", "bn"),
            ("se", "se"), ("conv_pwl", "conv"), ("bn3", "bn"),
        )
    return (("conv_dw", "conv"), ("bn1", "bn"), ("se", "se"),
            ("conv_pw", "conv"), ("bn2", "bn"))


def load_ported_efficientnet(npz_path: str, flax_params: Dict) -> Dict:
    """Map timm efficientnet_b0 names (conv_stem/bn1/blocks.{s}.{b}.*) onto
    our :class:`~smilify_tpu.models.backbones.EfficientNetEncoder` tree
    (submodules are named blocks_{s}_{b} with timm-matching layer names)."""
    import jax

    sd = dict(np.load(npz_path))
    params = jax.tree_util.tree_map(lambda x: x, flax_params)

    params["conv_stem"]["kernel"] = _conv(sd["conv_stem.weight"])
    params["bn1"]["scale"] = sd["bn1.weight"]
    params["bn1"]["bias"] = sd["bn1.bias"]

    for name in list(params):
        if not name.startswith("blocks_"):
            continue
        s, b = name.split("_")[1:]
        prefix = f"blocks.{s}.{b}"
        blk = params[name]
        for layer, kind in _effnet_block_layers(sd, prefix):
            if kind == "conv":
                blk[layer]["kernel"] = _conv(sd[f"{prefix}.{layer}.weight"])
            elif kind == "bn":
                blk[layer]["scale"] = sd[f"{prefix}.{layer}.weight"]
                blk[layer]["bias"] = sd[f"{prefix}.{layer}.bias"]
            else:  # se
                for se_conv in ("conv_reduce", "conv_expand"):
                    blk["se"][se_conv]["kernel"] = _conv(sd[f"{prefix}.se.{se_conv}.weight"])
                    blk["se"][se_conv]["bias"] = sd[f"{prefix}.se.{se_conv}.bias"]
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


def load_ported_unet_encoder(npz_path: str, flax_params: Dict,
                             flax_batch_stats: Dict) -> tuple:
    """Port a torchvision resnet34/resnet50 or timm efficientnet_b0 dump into
    the ``encoder`` subtree of a
    :class:`~smilify_tpu.models.backbones.UNetResNet` variable tree; the skip
    decoder stays at its fresh init (the reference's timm-encoder UNets are
    exactly this: pretrained encoder + random decoder,
    ``backbone_factory.py:319-514``). The encoder family is auto-detected from
    the dump's key names. Returns (params, batch_stats)."""
    sd_keys = np.load(npz_path).files
    params = dict(flax_params)
    stats = dict(flax_batch_stats)
    if "conv_stem.weight" in sd_keys:  # timm efficientnet
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
                           "unet_efficientnet_b3", "unet_efficientnet_b5"):
        params, batch_stats = dict(params), dict(batch_stats)
        params[key], batch_stats[key] = load_ported_unet_encoder(
            npz_path, params[key], batch_stats[key]
        )
    else:
        raise ValueError(
            f"no torch weight source exists for backbone '{backbone_name}' — "
            "the hand-rolled UNet variants (unet_small/unet_micro) train from "
            "scratch; unet_resnet34/unet_resnet50/unet_efficientnet_b0 take "
            "torchvision resnet34/resnet50 or timm efficientnet_b0 dumps"
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
