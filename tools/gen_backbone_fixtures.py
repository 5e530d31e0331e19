"""Generate torch backbone parity fixtures (run in a torch-only subprocess).

The environment has no torchvision/timm and no network egress, so pretrained
weights can't be downloaded here — but weight-port *correctness* doesn't
depend on the weight values. This script builds randomly-initialized torch
models with the exact architectures and state-dict naming of
``torchvision.models.resnet50`` and ``timm vit_base_patch16_224`` (the
reference's backbones, ``neuralSMIL/backbone_factory.py:105-118,178-235``),
runs them in eval mode on a fixed input, and dumps

    {state-dict tensors...,  __input__,  __pooled__ [, __tokens__]}

to an .npz. ``tests/test_weight_port.py`` then ports the state dict through
``smilify_tpu.models.weight_port`` into the Flax backbones and asserts
forward parity ≤ 1e-4 — which validates the port for real pretrained dumps
made with ``python -m smilify_tpu.models.weight_port dump`` on a connected
machine.

Round 4 extends coverage to the reference's *flagship* benchmark backbone
(vit_large_patch16_224, ``GETTING_STARTED.md:40-95``), resnet152, and the
resnet34 UNet encoder (the reference's timm-encoder UNets,
``backbone_factory.py:319-514`` — the encoder fixture dumps per-stage feature
maps so the ported skip pyramid is checked stage by stage).

Usage:  python tools/gen_backbone_fixtures.py
            {resnet50|resnet152|vit_base|vit_large|
             resnet34_encoder|resnet50_encoder|efficientnet_b0_encoder} out.npz
"""

import math
import sys

import numpy as np
import torch
import torch.nn as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# torchvision-compatible ResNet-50 (module names: conv1/bn1/layer{1-4}.{b}.*)
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet50(nn.Module):
    def __init__(self, stage_sizes=(3, 4, 6, 3), block=Bottleneck):
        super().__init__()
        self.block = block
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, stage_sizes[0], 1)
        self.layer2 = self._make_layer(128, stage_sizes[1], 2)
        self.layer3 = self._make_layer(256, stage_sizes[2], 2)
        self.layer4 = self._make_layer(512, stage_sizes[3], 2)

    def _make_layer(self, planes, blocks, stride):
        exp = self.block.expansion
        downsample = None
        if stride != 1 or self.inplanes != planes * exp:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * exp, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * exp),
            )
        layers = [self.block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * exp
        layers += [self.block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward_stages(self, x):
        """The five UNet skip stages (resnet34 encoder contract)."""
        s0 = self.relu(self.bn1(self.conv1(x)))
        s1 = self.layer1(self.maxpool(s0))
        s2 = self.layer2(s1)
        s3 = self.layer3(s2)
        s4 = self.layer4(s3)
        return s0, s1, s2, s3, s4

    def init_like_torchvision(self):
        # kaiming fan-out init (torchvision resnet __init__) keeps activation
        # variance alive through 50 random layers, so parity isn't tested on 0s
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3))  # GAP, matches our Flax pooled output


# ---------------------------------------------------------------------------
# timm-compatible ViT-B/16 (names: patch_embed.proj, blocks.{i}.attn.qkv, ...)
# ---------------------------------------------------------------------------


class Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, D // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(x)


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.act = nn.GELU()
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch=16):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class ViTB16(nn.Module):
    def __init__(self, depth=12, dim=768, heads=12, img=224, patch=16):
        super().__init__()
        n_patches = (img // patch) ** 2
        self.patch_embed = PatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.randn(1, n_patches + 1, dim) * 0.02)
        self.blocks = nn.Sequential(*[Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)
        nn.init.normal_(self.cls_token, std=0.02)

    def forward(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        x = self.norm(self.blocks(x))
        return x[:, 0], x[:, 1:]  # (CLS pooled, patch tokens)


# ---------------------------------------------------------------------------
# timm-compatible efficientnet_b0/b3/b5 (names: conv_stem/bn1/blocks.{s}.{b}.*)
#
# CAVEAT: these replicas are hand-rolled from the published architecture
# tables, so the parity fixtures are self-referential — they prove the
# torch->flax converter, not agreement with real timm (e.g. SE
# reduced-channel rounding on the b3/b5 scaled widths could diverge).
# load_ported_efficientnet shape-checks every assignment so a real timm dump
# that disagrees fails loudly; a one-time spot check against a real timm
# state dict on a connected machine is still owed (see weight_port.py).
# ---------------------------------------------------------------------------


class SqueezeExcite(nn.Module):
    def __init__(self, chs, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, reduced, 1, bias=True)
        self.conv_expand = nn.Conv2d(reduced, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(torch.nn.functional.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class DepthwiseSeparableConv(nn.Module):
    """timm effnet stage-0 block: dw → SE → pw-linear."""

    def __init__(self, in_chs, out_chs, k=3):
        super().__init__()
        self.conv_dw = nn.Conv2d(in_chs, in_chs, k, padding=k // 2, groups=in_chs, bias=False)
        self.bn1 = nn.BatchNorm2d(in_chs)
        self.se = SqueezeExcite(in_chs, max(1, int(in_chs * 0.25)))
        self.conv_pw = nn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_chs)
        self.has_residual = in_chs == out_chs

    def forward(self, x):
        y = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(self.se(y)))
        return y + x if self.has_residual else y


class InvertedResidual(nn.Module):
    """timm effnet MBConv: pw-expand → dw → SE → pw-linear (+residual)."""

    def __init__(self, in_chs, out_chs, k=3, stride=1, expand=6):
        super().__init__()
        mid = in_chs * expand
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, k, stride=stride, padding=k // 2, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = SqueezeExcite(mid, max(1, int(in_chs * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_chs)
        self.has_residual = stride == 1 and in_chs == out_chs

    def forward(self, x):
        y = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
        y = torch.nn.functional.silu(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(self.se(y)))
        return y + x if self.has_residual else y


# must match smilify_tpu.models.backbones.EFFICIENTNET_VARIANTS
EFFNET_VARIANTS = {
    "efficientnet_b0": (32, (
        ("ds", 1, 3, 1, 1, 16),
        ("ir", 2, 3, 2, 6, 24),
        ("ir", 2, 5, 2, 6, 40),
        ("ir", 3, 3, 2, 6, 80),
        ("ir", 3, 5, 1, 6, 112),
        ("ir", 4, 5, 2, 6, 192),
        ("ir", 1, 3, 1, 6, 320),
    )),
    "efficientnet_b3": (40, (
        ("ds", 2, 3, 1, 1, 24),
        ("ir", 3, 3, 2, 6, 32),
        ("ir", 3, 5, 2, 6, 48),
        ("ir", 5, 3, 2, 6, 96),
        ("ir", 5, 5, 1, 6, 136),
        ("ir", 6, 5, 2, 6, 232),
        ("ir", 2, 3, 1, 6, 384),
    )),
    "efficientnet_b5": (48, (
        ("ds", 3, 3, 1, 1, 24),
        ("ir", 5, 3, 2, 6, 40),
        ("ir", 5, 5, 2, 6, 64),
        ("ir", 7, 3, 2, 6, 128),
        ("ir", 7, 5, 1, 6, 176),
        ("ir", 9, 5, 2, 6, 304),
        ("ir", 3, 3, 1, 6, 512),
    )),
}
EFFNET_FEATURE_STAGES = (0, 1, 2, 4, 6)


class EfficientNetB0(nn.Module):
    def __init__(self, variant="efficientnet_b0"):
        super().__init__()
        stem_ch, stage_cfg = EFFNET_VARIANTS[variant]
        self.conv_stem = nn.Conv2d(3, stem_ch, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem_ch)
        blocks = []
        in_chs = stem_ch
        for kind, n_blocks, k, stride, expand, out_chs in stage_cfg:
            stage = []
            for b in range(n_blocks):
                if kind == "ds":
                    stage.append(DepthwiseSeparableConv(in_chs, out_chs, k))
                else:
                    stage.append(InvertedResidual(in_chs, out_chs, k,
                                                  stride if b == 0 else 1, expand))
                in_chs = out_chs
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)

    def forward_stages(self, x):
        x = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
        feats = []
        for s, stage in enumerate(self.blocks):
            x = stage(x)
            if s in EFFNET_FEATURE_STAGES:
                feats.append(x)
        return feats

    def init_like_torchvision(self):
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")


# ---------------------------------------------------------------------------
# timm-compatible mobilenetv3_large_100 (names: conv_stem/bn1/blocks.{s}.{b}.*;
# same generic-builder layouts as effnet plus ConvBnAct (conv/bn1), per-block
# relu/hard-swish activation, and SE with ReLU + hard-sigmoid gate). Same
# self-referential caveat as the effnet replicas above.
# ---------------------------------------------------------------------------

# must match smilify_tpu.models.backbones.MOBILENETV3_LARGE_STAGES:
# (kind, kernel, stride, mid_ch, out_ch, act, se_ch)
MNV3_LARGE_STAGES = (
    (("ds", 3, 1, 16, 16, "relu", 0),),
    (("ir", 3, 2, 64, 24, "relu", 0),
     ("ir", 3, 1, 72, 24, "relu", 0)),
    (("ir", 5, 2, 72, 40, "relu", 24),
     ("ir", 5, 1, 120, 40, "relu", 32),
     ("ir", 5, 1, 120, 40, "relu", 32)),
    (("ir", 3, 2, 240, 80, "hswish", 0),
     ("ir", 3, 1, 200, 80, "hswish", 0),
     ("ir", 3, 1, 184, 80, "hswish", 0),
     ("ir", 3, 1, 184, 80, "hswish", 0)),
    (("ir", 3, 1, 480, 112, "hswish", 120),
     ("ir", 3, 1, 672, 112, "hswish", 168)),
    (("ir", 5, 2, 672, 160, "hswish", 168),
     ("ir", 5, 1, 960, 160, "hswish", 240),
     ("ir", 5, 1, 960, 160, "hswish", 240)),
    (("cn", 1, 1, 0, 960, "hswish", 0),),
)
MNV3_FEATURE_STAGES = (0, 1, 2, 4, 6)

_TORCH_ACTS = {"relu": torch.nn.functional.relu,
               "hswish": torch.nn.functional.hardswish}


class MNV3SqueezeExcite(nn.Module):
    """mnv3 SE: ReLU between convs, hard-sigmoid gate."""

    def __init__(self, chs, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, reduced, 1, bias=True)
        self.conv_expand = nn.Conv2d(reduced, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(torch.nn.functional.relu(self.conv_reduce(s)))
        return x * torch.nn.functional.hardsigmoid(s)


class MNV3Block(nn.Module):
    def __init__(self, in_chs, kind, k, stride, mid, out_chs, act, se_ch):
        super().__init__()
        self.kind, self.act = kind, _TORCH_ACTS[act]
        if kind == "cn":
            self.conv = nn.Conv2d(in_chs, out_chs, k, stride=stride,
                                  padding=k // 2, bias=False)
            self.bn1 = nn.BatchNorm2d(out_chs)
        elif kind == "ds":
            self.conv_dw = nn.Conv2d(in_chs, in_chs, k, stride=stride,
                                     padding=k // 2, groups=in_chs, bias=False)
            self.bn1 = nn.BatchNorm2d(in_chs)
            if se_ch:
                self.se = MNV3SqueezeExcite(in_chs, se_ch)
            self.conv_pw = nn.Conv2d(in_chs, out_chs, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(out_chs)
        else:  # ir
            self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.conv_dw = nn.Conv2d(mid, mid, k, stride=stride,
                                     padding=k // 2, groups=mid, bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            if se_ch:
                self.se = MNV3SqueezeExcite(mid, se_ch)
            self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out_chs)
        self.has_residual = kind != "cn" and stride == 1 and in_chs == out_chs

    def forward(self, x):
        if self.kind == "cn":
            return self.act(self.bn1(self.conv(x)))
        if self.kind == "ds":
            y = self.act(self.bn1(self.conv_dw(x)))
            if hasattr(self, "se"):
                y = self.se(y)
            y = self.bn2(self.conv_pw(y))
        else:
            y = self.act(self.bn1(self.conv_pw(x)))
            y = self.act(self.bn2(self.conv_dw(y)))
            if hasattr(self, "se"):
                y = self.se(y)
            y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_residual else y


class MobileNetV3Large(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(16)
        blocks = []
        in_chs = 16
        for stage in MNV3_LARGE_STAGES:
            mods = []
            for (kind, k, stride, mid, out_chs, act, se_ch) in stage:
                mods.append(MNV3Block(in_chs, kind, k, stride, mid, out_chs, act, se_ch))
                in_chs = out_chs
            blocks.append(nn.Sequential(*mods))
        self.blocks = nn.Sequential(*blocks)

    def forward_stages(self, x):
        x = torch.nn.functional.hardswish(self.bn1(self.conv_stem(x)))
        feats = []
        for s, stage in enumerate(self.blocks):
            x = stage(x)
            if s in MNV3_FEATURE_STAGES:
                feats.append(x)
        return feats

    def init_like_torchvision(self):
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")


# ---------------------------------------------------------------------------
# timm-compatible convnext_base (names: stem.{0,1},
# stages.{s}.downsample.{0,1}, stages.{s}.blocks.{b}.{conv_dw,norm,
# mlp.fc1,mlp.fc2,gamma}); channels-last LayerNorm eps 1e-6, exact GELU,
# layer-scale gamma. Same self-referential caveat as above.
# ---------------------------------------------------------------------------

CONVNEXT_BASE_DEPTHS = (3, 3, 27, 3)
CONVNEXT_BASE_DIMS = (128, 256, 512, 1024)


class ConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):
        y = self.conv_dw(x).permute(0, 2, 3, 1)          # NCHW → NHWC
        y = self.norm(y)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        y = (self.gamma * y).permute(0, 3, 1, 2)
        return x + y


class ConvNeXtBase(nn.Module):
    def __init__(self, depths=CONVNEXT_BASE_DEPTHS, dims=CONVNEXT_BASE_DIMS):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4, bias=True),
            nn.LayerNorm(dims[0], eps=1e-6),             # applied channels-last
        )
        stages = []
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, stride=2, bias=True),
                )
            stage.blocks = nn.Sequential(*[ConvNeXtBlock(dim) for _ in range(depth)])
            stages.append(stage)
        self.stages = nn.Sequential(*stages)

    @staticmethod
    def _ln(norm, x):  # channels-last LayerNorm on an NCHW tensor
        return norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    def forward_stages(self, x):
        x = self._ln(self.stem[1], self.stem[0](x))
        feats = []
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = stage.downsample[1](self._ln(stage.downsample[0], x))
            x = stage.blocks(x)
            feats.append(x)
        return feats

    def init_like_torchvision(self):
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            elif isinstance(m, nn.Linear):
                nn.init.normal_(m.weight, std=0.02)


def main():
    arch, out = sys.argv[1], sys.argv[2]
    torch.manual_seed(0)

    x = torch.rand(2, 3, 224, 224, generator=torch.Generator().manual_seed(7))
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    xn = (x - mean) / std

    resnets = {"resnet50": ((3, 4, 6, 3), Bottleneck),
               "resnet101": ((3, 4, 23, 3), Bottleneck),
               "resnet152": ((3, 8, 36, 3), Bottleneck)}
    vits = {"vit_base": dict(depth=12, dim=768, heads=12),
            "vit_large": dict(depth=24, dim=1024, heads=16)}
    if arch in resnets:
        sizes, block = resnets[arch]
        model = ResNet50(sizes, block)
        model.init_like_torchvision()
        model = model.eval()
        # non-default running stats so the port of batch_stats is actually tested
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0.0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        with torch.no_grad():
            pooled = model(xn)
        extra = {"__pooled__": pooled.numpy()}
    elif arch.startswith("efficientnet_") and arch.endswith("_encoder"):
        model = EfficientNetB0(arch[: -len("_encoder")])
        model.init_like_torchvision()
        model = model.eval()
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0.0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        with torch.no_grad():
            stages = model.forward_stages(xn)
        extra = {f"__stage{i}__": s.numpy().transpose(0, 2, 3, 1)
                 for i, s in enumerate(stages)}
    elif arch == "mobilenetv3_encoder":
        model = MobileNetV3Large()
        model.init_like_torchvision()
        model = model.eval()
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0.0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
            stages = model.forward_stages(xn)
        extra = {f"__stage{i}__": s.numpy().transpose(0, 2, 3, 1)
                 for i, s in enumerate(stages)}
    elif arch == "convnext_encoder":
        model = ConvNeXtBase()
        model.init_like_torchvision()
        model = model.eval()
        with torch.no_grad():
            stages = model.forward_stages(xn)
        extra = {f"__stage{i}__": s.numpy().transpose(0, 2, 3, 1)
                 for i, s in enumerate(stages)}
    elif arch in ("resnet34_encoder", "resnet50_encoder"):
        block = BasicBlock if arch == "resnet34_encoder" else Bottleneck
        model = ResNet50((3, 4, 6, 3), block)
        model.init_like_torchvision()
        model = model.eval()
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0.0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
        with torch.no_grad():
            stages = model.forward_stages(xn)
        # NCHW → NHWC per-stage maps: the ported skip pyramid is checked
        # stage by stage (a full-UNet forward can't be — the decoder is fresh)
        extra = {f"__stage{i}__": s.numpy().transpose(0, 2, 3, 1)
                 for i, s in enumerate(stages)}
    elif arch in vits:
        model = ViTB16(**vits[arch]).eval()
        with torch.no_grad():
            pooled, tokens = model(xn)
        extra = {"__pooled__": pooled.numpy(), "__tokens__": tokens.numpy()}
    else:
        raise SystemExit(f"unknown arch {arch}")

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd.update(extra)
    sd["__input__"] = x.numpy()  # raw [0,1]; Flax side applies its own normalize
    np.savez(out, **sd)
    print(f"{arch}: wrote {len(sd)} arrays -> {out}")


if __name__ == "__main__":
    main()
