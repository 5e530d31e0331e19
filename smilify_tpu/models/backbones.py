"""Image backbones in Flax: ResNet-50/101/152, ViT-B/L-16, UNet variants.

TPU-native replacements for the reference's torchvision/timm backbones
(``neuralSMIL/backbone_factory.py``). Every backbone returns a
:class:`BackboneFeatures` with
  * ``pooled``  — (B, D) global feature (GAP / CLS token),
  * ``tokens``  — (B, T, D) patch/spatial tokens for decoder cross-attention
    (196 tokens for ViT-16 @224; flattened final map for CNNs),
  * ``spatial`` — (B, H', W', C) final feature map (UNet decoders).

Weights are trained from scratch or loaded from converted checkpoints via
``smilify_tpu.models.weight_port`` (the environment has no network access, so
torchvision/timm pretrained weights must be converted offline to .npz).

Compute dtype is configurable (bf16 on TPU MXU by default); parameters stay
f32.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# torchvision/timm normalization constants (inputs are [0,1] RGB)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class BackboneFeatures(NamedTuple):
    pooled: jnp.ndarray
    tokens: Optional[jnp.ndarray]
    spatial: Optional[jnp.ndarray]


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------


def _make_norm(kind: str, dtype, train: bool):
    """'batch' → BatchNorm; 'group' → GroupNorm(32) — identical parameter
    count/shapes (scale+bias per channel) but NO batch-statistics passes, the
    measured source of the ResNet-BN training-MFU ceiling (docs/PERFORMANCE.md
    §Training MFU; tools/prof_step_extra.py attribution)."""
    if kind == "group":
        return lambda: nn.GroupNorm(num_groups=32, dtype=dtype)
    return lambda: nn.BatchNorm(use_running_average=not train, dtype=dtype)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _make_norm(self.norm, self.dtype, train)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-v1 bottleneck backbone (50/101/152 via stage_sizes).

    ``norm='group'`` swaps every BatchNorm for GroupNorm(32): same parameter
    shapes, no running statistics, no per-microbatch normalization coupling
    under gradient accumulation — the recommended *training* backbone on TPU
    (the BN statistics passes are the measured train-MFU ceiling)."""

    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False) -> BackboneFeatures:
        x = normalize_imagenet(x).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype)(x)
        x = _make_norm(self.norm, self.dtype, train)()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and i > 0) else 1
                x = Bottleneck(64 * 2**i, strides=strides, dtype=self.dtype,
                               norm=self.norm)(x, train=train)
        spatial = x.astype(jnp.float32)  # (B, H/32, W/32, 2048)
        pooled = jnp.mean(spatial, axis=(1, 2))
        B, Hs, Ws, C = spatial.shape
        tokens = spatial.reshape(B, Hs * Ws, C)
        return BackboneFeatures(pooled=pooled, tokens=tokens, spatial=spatial)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)  # torch LN default eps
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=self.dtype)(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)  # torch LN default eps
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)  # timm ViT uses exact-erf GELU
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class ViT(nn.Module):
    """ViT-16 (base: 12×768, large: 24×1024) with CLS token + patch tokens."""

    depth: int
    dim: int
    num_heads: int
    patch: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> BackboneFeatures:
        x = normalize_imagenet(x).astype(self.dtype)
        B, H, W, _ = x.shape
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
                    dtype=self.dtype, name="patch_embed")(x)
        Hs, Ws = x.shape[1], x.shape[2]
        x = x.reshape(B, Hs * Ws, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, Hs * Ws + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)).astype(self.dtype), x], axis=1)
        x = x + pos.astype(self.dtype)
        for _ in range(self.depth):
            x = TransformerBlock(self.dim, self.num_heads, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x).astype(jnp.float32)
        cls_out = x[:, 0]
        tokens = x[:, 1:]
        spatial = tokens.reshape(B, Hs, Ws, self.dim)
        return BackboneFeatures(pooled=cls_out, tokens=tokens, spatial=spatial)


# ---------------------------------------------------------------------------
# UNet (CNN encoder + skip decoder → spatial map; reference UNetBackbone)
# ---------------------------------------------------------------------------


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Encoder-decoder with skips; pooled vector + decoder tokens."""

    widths: Sequence[int] = (64, 128, 256, 512, 1024)
    out_dim: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> BackboneFeatures:
        x = normalize_imagenet(x).astype(self.dtype)
        skips = []
        for w in self.widths[:-1]:
            x = ConvBlock(w, dtype=self.dtype)(x, train=train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.widths[-1], dtype=self.dtype)(x, train=train)
        bottleneck = x
        for w, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest-neighbor ×2
            x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(w, dtype=self.dtype)(x, train=train)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype)(x)
        spatial = x.astype(jnp.float32)
        pooled = jnp.mean(bottleneck.astype(jnp.float32), axis=(1, 2))
        # decoder tokens at 1/8 resolution for cross-attention (bounded count)
        tok_map = nn.avg_pool(spatial, (8, 8), strides=(8, 8))
        B, Ht, Wt, C = tok_map.shape
        tokens = tok_map.reshape(B, Ht * Wt, C)
        return BackboneFeatures(pooled=pooled, tokens=tokens, spatial=spatial)


class BasicBlock(nn.Module):
    """torchvision ResNet BasicBlock (resnet18/34): two 3×3 convs + identity."""

    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)  # noqa: E731
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(self.features, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """torchvision ResNet trunk exposing the five UNet skip stages.

    ``block='basic'`` is the resnet34 layout — stage channels/strides
    (64,/2) (64,/4) (128,/8) (256,/16) (512,/32); ``block='bottleneck'`` is
    resnet50 — (64,/2) (256,/4) (512,/8) (1024,/16) (2048,/32). Both are
    exactly the feature pyramids the reference's timm-encoder UNets consume
    (``neuralSMIL/backbone_factory.py:319-514``). Weights port from a
    torchvision resnet34/resnet50 state dict via
    ``weight_port.load_ported_resnet`` (BasicBlock/Bottleneck naming is
    auto-detected from the dump).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "basic"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        stages = [x]                                   # (B, H/2, W/2, 64)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and i > 0) else 1
                if self.block == "bottleneck":
                    x = Bottleneck(64 * 2**i, strides=strides, dtype=self.dtype)(x, train=train)
                else:
                    x = BasicBlock(64 * 2**i, strides=strides, dtype=self.dtype)(x, train=train)
            stages.append(x)                           # /4, /8, /16, /32
        return stages


# historical name (round-4 tests/checkpoints predate the resnet50 variant);
# the submodule is always explicitly name="encoder", so the alias changes no
# parameter trees
ResNet34Encoder = ResNetEncoder


# ---------------------------------------------------------------------------
# EfficientNet-B0 encoder (timm `efficientnet_b0`, the reference's
# unet_efficientnet_b0 — backbone_factory.py:337-345 creates it with
# features_only=True and consumes the stride-2..32 feature pyramid)
# ---------------------------------------------------------------------------

# (block_type, num_blocks, kernel, first_stride, expand_ratio, out_channels);
# mirrors timm's efficientnet_b0 arch_def. SE reduction is 0.25 of each
# block's INPUT channels (timm v1 semantics for effnet). The b3/b5 tables are
# the standard compound scaling (width 1.2/1.6 via round_channels-to-8, depth
# 1.4/2.2 via ceil) — their feature pyramids (24,32,48,136,384) and
# (24,40,64,176,512) are exactly what the reference's channel probe reports
# for timm's features_only models (backbone_factory.py:390 comment).
EFFICIENTNET_B0_STAGES = (
    ("ds", 1, 3, 1, 1, 16),
    ("ir", 2, 3, 2, 6, 24),
    ("ir", 2, 5, 2, 6, 40),
    ("ir", 3, 3, 2, 6, 80),
    ("ir", 3, 5, 1, 6, 112),
    ("ir", 4, 5, 2, 6, 192),
    ("ir", 1, 3, 1, 6, 320),
)
EFFICIENTNET_B3_STAGES = (
    ("ds", 2, 3, 1, 1, 24),
    ("ir", 3, 3, 2, 6, 32),
    ("ir", 3, 5, 2, 6, 48),
    ("ir", 5, 3, 2, 6, 96),
    ("ir", 5, 5, 1, 6, 136),
    ("ir", 6, 5, 2, 6, 232),
    ("ir", 2, 3, 1, 6, 384),
)
EFFICIENTNET_B5_STAGES = (
    ("ds", 3, 3, 1, 1, 24),
    ("ir", 5, 3, 2, 6, 40),
    ("ir", 5, 5, 2, 6, 64),
    ("ir", 7, 3, 2, 6, 128),
    ("ir", 7, 5, 1, 6, 176),
    ("ir", 9, 5, 2, 6, 304),
    ("ir", 3, 3, 1, 6, 512),
)
EFFICIENTNET_VARIANTS = {
    "efficientnet_b0": (32, EFFICIENTNET_B0_STAGES, 320),
    "efficientnet_b3": (40, EFFICIENTNET_B3_STAGES, 384),
    "efficientnet_b5": (48, EFFICIENTNET_B5_STAGES, 512),
}
# stages whose OUTPUT is a UNet skip feature (strides 2, 4, 8, 16, 32)
_EFFNET_FEATURE_STAGES = (0, 1, 2, 4, 6)


class _SqueezeExcite(nn.Module):
    """timm SqueezeExcite: GAP → conv_reduce → SiLU → conv_expand → sigmoid gate."""

    reduced: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * nn.sigmoid(s)


class _DSConv(nn.Module):
    """timm DepthwiseSeparableConv (effnet stage 0): dw → SE → pw-linear."""

    out_ch: int
    kernel: int = 3
    se_ch: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        y = nn.Conv(C, (self.kernel, self.kernel), padding=self.kernel // 2,
                    feature_group_count=C, use_bias=False, dtype=self.dtype,
                    name="conv_dw")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.silu(y)
        y = _SqueezeExcite(self.se_ch, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if y.shape == x.shape:
            y = y + x
        return y


class _MBConv(nn.Module):
    """timm InvertedResidual: pw-expand → dw → SE → pw-linear (+residual)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    se_ch: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        mid = C * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.silu(y)
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=self.kernel // 2,
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    name="conv_dw")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        y = nn.silu(y)
        y = _SqueezeExcite(self.se_ch, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3")(y)
        if self.stride == 1 and self.out_ch == C:
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    """timm efficientnet_b0/b3/b5 trunk exposing the five UNet skip stages —
    e.g. b0 channels (16,/2) (24,/4) (40,/8) (112,/16) (320,/32), exactly the
    ``features_only=True`` pyramid the reference's UNetBackbone consumes
    (``backbone_factory.py:383-395``). Weights port from a timm
    efficientnet state dict via ``weight_port.load_ported_efficientnet``
    (submodule names mirror timm's conv_stem/bn1/blocks.{s}.{b} keys)."""

    stem_ch: int = 32
    stages: tuple = EFFICIENTNET_B0_STAGES
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.silu(x)
        feats = []
        for s, (kind, n_blocks, kernel, stride, expand, out_ch) in enumerate(self.stages):
            for b in range(n_blocks):
                se_ch = max(1, int(x.shape[-1] * 0.25))
                name = f"blocks_{s}_{b}"
                if kind == "ds":
                    x = _DSConv(out_ch, kernel=kernel, se_ch=se_ch,
                                dtype=self.dtype, name=name)(x, train=train)
                else:
                    x = _MBConv(out_ch, kernel=kernel,
                                stride=stride if b == 0 else 1, expand=expand,
                                se_ch=se_ch, dtype=self.dtype, name=name)(x, train=train)
            if s in _EFFNET_FEATURE_STAGES:
                feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# MobileNetV3-Large encoder (timm `mobilenetv3_large_100`, the reference's
# unet_mobilenet_v3 — backbone_factory.py:337-345). Same generic-builder block
# families as EfficientNet but with per-block activation (relu/hard-swish),
# optional SE with hard-sigmoid gate, exact mid-channel counts, and a final
# ConvBnAct (cn) 960-channel block.
# ---------------------------------------------------------------------------

# per-block entries: (kind, kernel, stride, mid_ch, out_ch, act, se_ch);
# se_ch=0 → no SE. Derived from timm's mobilenetv3_large_100 arch_def
# ('ds_r1_k3_s1_e1_c16_nre', 'ir_r1_k3_s2_e4_c24_nre', … — mid channels are
# make_divisible(in*expand), SE reduced = round_channels(mid*0.25, 8) with
# relu act + hard-sigmoid gate). Stage grouping mirrors timm's blocks.{s}.{b}.
MOBILENETV3_LARGE_STAGES = (
    # stage 0 (/2 feature)
    (("ds", 3, 1, 16, 16, "relu", 0),),
    # stage 1 (/4 feature)
    (("ir", 3, 2, 64, 24, "relu", 0),
     ("ir", 3, 1, 72, 24, "relu", 0)),
    # stage 2 (/8 feature)
    (("ir", 5, 2, 72, 40, "relu", 24),
     ("ir", 5, 1, 120, 40, "relu", 32),
     ("ir", 5, 1, 120, 40, "relu", 32)),
    # stage 3
    (("ir", 3, 2, 240, 80, "hswish", 0),
     ("ir", 3, 1, 200, 80, "hswish", 0),
     ("ir", 3, 1, 184, 80, "hswish", 0),
     ("ir", 3, 1, 184, 80, "hswish", 0)),
    # stage 4 (/16 feature)
    (("ir", 3, 1, 480, 112, "hswish", 120),
     ("ir", 3, 1, 672, 112, "hswish", 168)),
    # stage 5
    (("ir", 5, 2, 672, 160, "hswish", 168),
     ("ir", 5, 1, 960, 160, "hswish", 240),
     ("ir", 5, 1, 960, 160, "hswish", 240)),
    # stage 6 (/32 feature)
    (("cn", 1, 1, 0, 960, "hswish", 0),),
)
_MNV3_FEATURE_STAGES = (0, 1, 2, 4, 6)
MOBILENETV3_FEATURE_DIM = 960


def _act(name: str):
    import jax

    return {"silu": nn.silu, "relu": nn.relu, "hswish": jax.nn.hard_swish}[name]


class _MNV3SqueezeExcite(nn.Module):
    """mobilenetv3 SE: GAP → conv_reduce → ReLU → conv_expand → hard-sigmoid
    gate (timm forces ReLU + hard_sigmoid for mnv3, vs SiLU + sigmoid for
    efficientnet)."""

    reduced: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax

        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="conv_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * jax.nn.hard_sigmoid(s)


class _MNV3Block(nn.Module):
    """One mobilenetv3 block in timm's generic-builder layouts:
    ds (conv_dw/bn1[/se]/conv_pw/bn2), ir (conv_pw/bn1/conv_dw/bn2[/se]/
    conv_pwl/bn3), cn (conv/bn1)."""

    kind: str
    kernel: int
    stride: int
    mid_ch: int
    out_ch: int
    act: str
    se_ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.act)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name)
        C = x.shape[-1]
        if self.kind == "cn":
            y = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding=self.kernel // 2,
                        use_bias=False, dtype=self.dtype, name="conv")(x)
            return act(bn("bn1")(y))
        if self.kind == "ds":
            y = nn.Conv(C, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                        padding=self.kernel // 2, feature_group_count=C, use_bias=False,
                        dtype=self.dtype, name="conv_dw")(x)
            y = act(bn("bn1")(y))
            if self.se_ch:
                y = _MNV3SqueezeExcite(self.se_ch, dtype=self.dtype, name="se")(y)
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_pw")(y)
            y = bn("bn2")(y)
            if self.stride == 1 and self.out_ch == C:
                y = y + x
            return y
        # ir
        y = nn.Conv(self.mid_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        y = act(bn("bn1")(y))
        y = nn.Conv(self.mid_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=self.kernel // 2,
                    feature_group_count=self.mid_ch, use_bias=False, dtype=self.dtype,
                    name="conv_dw")(y)
        y = act(bn("bn2")(y))
        if self.se_ch:
            y = _MNV3SqueezeExcite(self.se_ch, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl")(y)
        y = bn("bn3")(y)
        if self.stride == 1 and self.out_ch == C:
            y = y + x
        return y


class MobileNetV3Encoder(nn.Module):
    """timm mobilenetv3_large_100 trunk exposing the five UNet skip stages —
    channels (16,/2) (24,/4) (40,/8) (112,/16) (960,/32), the
    ``features_only=True`` pyramid the reference's UNetBackbone consumes
    (``backbone_factory.py:337-345``). Weights port via
    ``weight_port.load_ported_efficientnet`` (same timm generic-builder
    naming: conv_stem/bn1/blocks.{s}.{b})."""

    stages: tuple = MOBILENETV3_LARGE_STAGES
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax

        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = jax.nn.hard_swish(x)
        feats = []
        for s, stage in enumerate(self.stages):
            for b, (kind, kernel, stride, mid, out_ch, act, se_ch) in enumerate(stage):
                x = _MNV3Block(kind, kernel, stride, mid, out_ch, act, se_ch,
                               dtype=self.dtype, name=f"blocks_{s}_{b}")(x, train=train)
            if s in _MNV3_FEATURE_STAGES:
                feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# ConvNeXt-Base encoder (timm `convnext_base`, the reference's
# unet_convnext_base — backbone_factory.py:337-345). A different block family
# entirely: 7×7 depthwise conv + channels-last LayerNorm(1e-6) + pointwise
# MLP with GELU + layer-scale gamma; patchify stem; LN+2×2-conv downsampling.
# features_only yields FOUR maps (strides 4/8/16/32 — no stride-2 stage), so
# the UNet decoder runs three decode steps against three skips.
# ---------------------------------------------------------------------------

CONVNEXT_BASE_DEPTHS = (3, 3, 27, 3)
CONVNEXT_BASE_DIMS = (128, 256, 512, 1024)
CONVNEXT_FEATURE_DIM = CONVNEXT_BASE_DIMS[-1]


class _ConvNeXtBlock(nn.Module):
    """timm ConvNeXtBlock: conv_dw 7×7 (bias) → LN(1e-6) → mlp.fc1 (4×) →
    GELU → mlp.fc2 → ×gamma → +residual. All channels-last; no BatchNorm."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="conv_dw")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma.astype(y.dtype) * y


class ConvNeXtEncoder(nn.Module):
    """timm convnext_base trunk exposing the four feature stages
    (128,/4) (256,/8) (512,/16) (1024,/32). LayerNorm-only (no batch_stats
    collection). Weights port via ``weight_port.load_ported_convnext``
    (submodule names mirror timm's stem.{0,1} / stages.{s}.downsample.{0,1} /
    stages.{s}.blocks.{b} keys)."""

    depths: Sequence[int] = CONVNEXT_BASE_DEPTHS
    dims: Sequence[int] = CONVNEXT_BASE_DIMS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        feats = []
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"stages_{s}_downsample_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"stages_{s}_downsample_conv")(x)
            for b in range(depth):
                x = _ConvNeXtBlock(dim, dtype=self.dtype,
                                   name=f"stages_{s}_blocks_{b}")(x)
            feats.append(x)
        return feats


class UNetResNet(nn.Module):
    """UNet with a (portable, pretrained) encoder + skip decoder — the
    reference's timm-encoder UNets (``backbone_factory.py:319-514``,
    ``_ENCODER_MAP``: resnet34/resnet50, efficientnet_b0/b3/b5,
    convnext_base, mobilenetv3_large_100), here with the encoder
    weight-portable from torchvision/timm so ``model.pretrained_npz`` works
    for UNet variants too. (The class name is historical — round-4
    checkpoints predate the non-resnet encoders.)

    Encoders expose 5 skip stages at strides 2..32 (4 at strides 4..32 for
    ConvNeXt, which has no stride-2 feature); the decoder zips its widths
    against the available skips, so it runs len(stages)-1 decode steps.
    """

    encoder_arch: str = "resnet34"
    decoder_widths: Sequence[int] = (256, 128, 64, 32)
    out_dim: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> BackboneFeatures:
        x = normalize_imagenet(x).astype(self.dtype)
        if self.encoder_arch in EFFICIENTNET_VARIANTS:
            stem, stage_cfg, _ = EFFICIENTNET_VARIANTS[self.encoder_arch]
            stages = EfficientNetEncoder(stem_ch=stem, stages=stage_cfg,
                                         dtype=self.dtype, name="encoder")(x, train=train)
        elif self.encoder_arch == "convnext_base":
            stages = ConvNeXtEncoder(dtype=self.dtype, name="encoder")(x, train=train)
        elif self.encoder_arch == "mobilenetv3_large_100":
            stages = MobileNetV3Encoder(dtype=self.dtype, name="encoder")(x, train=train)
        else:
            block = "bottleneck" if self.encoder_arch == "resnet50" else "basic"
            stages = ResNetEncoder(block=block, dtype=self.dtype, name="encoder")(x, train=train)
        bottleneck = stages[-1]                        # (B, H/32, W/32, 512)
        y = bottleneck
        # decode /32 → /2 against skips [/16, /8, /4, /2]
        for w, skip in zip(self.decoder_widths, reversed(stages[:-1])):
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype)(y)
            y = jnp.concatenate([y, skip], axis=-1)
            y = ConvBlock(w, dtype=self.dtype)(y, train=train)
        y = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype)(y)
        spatial = y.astype(jnp.float32)                # (B, H/2, W/2, out_dim)
        pooled = jnp.mean(bottleneck.astype(jnp.float32), axis=(1, 2))
        # decoder tokens at 1/16 input resolution (bounded count for the
        # transformer head's cross-attention)
        tok_map = nn.avg_pool(spatial, (8, 8), strides=(8, 8))
        B, Ht, Wt, C = tok_map.shape
        tokens = tok_map.reshape(B, Ht * Wt, C)
        return BackboneFeatures(pooled=pooled, tokens=tokens, spatial=spatial)


# ---------------------------------------------------------------------------
# factory (reference BackboneFactory.SUPPORTED_BACKBONES)
# ---------------------------------------------------------------------------

BACKBONES: dict = {
    "resnet50": lambda dtype=jnp.bfloat16: (ResNet([3, 4, 6, 3], dtype=dtype), 2048),
    # GroupNorm(32) variant: the recommended TRAINING backbone on TPU — no
    # batch-statistics passes (the measured BN train-MFU ceiling), exact
    # gradient-accumulation equivalence. Not weight-portable from torchvision
    # BN checkpoints (different normalization statistics semantics).
    "resnet50_gn": lambda dtype=jnp.bfloat16: (ResNet([3, 4, 6, 3], dtype=dtype, norm="group"), 2048),
    "resnet101": lambda dtype=jnp.bfloat16: (ResNet([3, 4, 23, 3], dtype=dtype), 2048),
    "resnet152": lambda dtype=jnp.bfloat16: (ResNet([3, 8, 36, 3], dtype=dtype), 2048),
    "vit_base_patch16_224": lambda dtype=jnp.bfloat16: (ViT(12, 768, 12, dtype=dtype), 768),
    "vit_large_patch16_224": lambda dtype=jnp.bfloat16: (ViT(24, 1024, 16, dtype=dtype), 1024),
    # resnet34/resnet50 encoders (weight-portable from torchvision) + skip
    # decoder; pooled dim = the encoder bottleneck channels
    "unet_resnet34": lambda dtype=jnp.bfloat16: (UNetResNet(dtype=dtype), 512),
    "unet_resnet50": lambda dtype=jnp.bfloat16: (UNetResNet(encoder_arch="resnet50", dtype=dtype), 2048),
    "unet_efficientnet_b0": lambda dtype=jnp.bfloat16: (UNetResNet(encoder_arch="efficientnet_b0", dtype=dtype), 320),
    "unet_efficientnet_b3": lambda dtype=jnp.bfloat16: (UNetResNet(encoder_arch="efficientnet_b3", dtype=dtype), 384),
    "unet_efficientnet_b5": lambda dtype=jnp.bfloat16: (UNetResNet(encoder_arch="efficientnet_b5", dtype=dtype), 512),
    # convnext has no stride-2 stage: 4-level pyramid, 3 decode steps
    "unet_convnext_base": lambda dtype=jnp.bfloat16: (
        UNetResNet(encoder_arch="convnext_base", decoder_widths=(256, 128, 64),
                   dtype=dtype), CONVNEXT_FEATURE_DIM),
    "unet_mobilenet_v3": lambda dtype=jnp.bfloat16: (
        UNetResNet(encoder_arch="mobilenetv3_large_100", dtype=dtype),
        MOBILENETV3_FEATURE_DIM),
    "unet_small": lambda dtype=jnp.bfloat16: (UNet(widths=(32, 64, 128, 256), out_dim=256, dtype=dtype), 256),
    # 2× unet_small width: the from-scratch capacity point between unet_small
    # and the ported-encoder UNets (train-fit ceiling at unet_small measured
    # in the round-5 generalization runs — benchmarks/gen_r5/)
    "unet_mid": lambda dtype=jnp.bfloat16: (UNet(widths=(64, 128, 256, 512), out_dim=512, dtype=dtype), 512),
    # micro variant for CI / SPMD-invariance tests: same architecture shape,
    # minimal channel counts so CPU XLA compiles in seconds
    "unet_micro": lambda dtype=jnp.bfloat16: (UNet(widths=(8, 16, 32), out_dim=32, dtype=dtype), 32),
}


def create_backbone(name: str, dtype=jnp.bfloat16):
    """(module, feature_dim) for a supported backbone name."""
    if name not in BACKBONES:
        raise ValueError(f"unsupported backbone {name}; choose from {sorted(BACKBONES)}")
    return BACKBONES[name](dtype=dtype)
