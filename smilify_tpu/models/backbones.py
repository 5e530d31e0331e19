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


class ResNet34Encoder(nn.Module):
    """torchvision resnet34 trunk exposing the five UNet skip stages.

    Stage channels/strides (64,/2) (64,/4) (128,/8) (256,/16) (512,/32) —
    exactly the feature pyramid the reference's timm-encoder UNets consume
    (``neuralSMIL/backbone_factory.py:319-514``). Weights port from a
    torchvision resnet34 state dict via
    ``weight_port.load_ported_resnet`` (BasicBlock naming).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
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
                x = BasicBlock(64 * 2**i, strides=strides, dtype=self.dtype)(x, train=train)
            stages.append(x)                           # /4, /8, /16, /32
        return stages


class UNetResNet(nn.Module):
    """UNet with a (portable, pretrained) resnet34 encoder + skip decoder —
    the reference's ``unet_resnet34`` (timm encoder + skip decoder,
    ``backbone_factory.py:319-514``), here with the encoder weight-portable
    from torchvision so ``model.pretrained_npz`` works for UNet variants too.
    """

    decoder_widths: Sequence[int] = (256, 128, 64, 32)
    out_dim: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> BackboneFeatures:
        x = normalize_imagenet(x).astype(self.dtype)
        stages = ResNet34Encoder(dtype=self.dtype, name="encoder")(x, train=train)
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
    # resnet34 encoder (weight-portable from torchvision) + skip decoder;
    # pooled dim = 512 (the encoder bottleneck)
    "unet_resnet34": lambda dtype=jnp.bfloat16: (UNetResNet(dtype=dtype), 512),
    "unet_small": lambda dtype=jnp.bfloat16: (UNet(widths=(32, 64, 128, 256), out_dim=256, dtype=dtype), 256),
    # micro variant for CI / SPMD-invariance tests: same architecture shape,
    # minimal channel counts so CPU XLA compiles in seconds
    "unet_micro": lambda dtype=jnp.bfloat16: (UNet(widths=(8, 16, 32), out_dim=32, dtype=dtype), 32),
}


def create_backbone(name: str, dtype=jnp.bfloat16):
    """(module, feature_dim) for a supported backbone name."""
    if name not in BACKBONES:
        raise ValueError(f"unsupported backbone {name}; choose from {sorted(BACKBONES)}")
    return BACKBONES[name](dtype=dtype)
