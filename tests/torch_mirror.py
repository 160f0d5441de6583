"""Torch mirror of the reference TemporalStereo backbone, used ONLY by the
numeric-parity tests.

The sandbox has no timm and no network access, so real ImageNet weights are
unavailable (blocker documented in PROGRESS/README).  This module is the
strongest available substitute: an independent torch implementation following
the reference/timm semantics exactly —
  * stem: 3x3/2 conv + BN + SiLU                       (timm efficientnetv2_rw_s)
  * EdgeResidual ('er'): conv_exp 3x3 + bn1 + SiLU -> conv_pwl 1x1 + bn2,
    residual iff stride 1 and in==out
  * InvertedResidual ('ir'): conv_pw 1x1 + bn1 + SiLU -> depthwise conv_dw
    3x3 + bn2 + SiLU -> SE (conv_reduce/SiLU/conv_expand/sigmoid,
    rd = in_ch * se_ratio) -> conv_pwl 1x1 + bn3, residual iff stride 1 and
    in==out                                  (reference backbone/TemporalStereo.py:183-218)
  * FPN top-down decoder with align_corners bilinear upsampling
                                            (reference backbone/TemporalStereo.py:78-90,125-138)

Its ``state_dict()`` uses timm's key layout (conv_stem.weight, bn1.*,
blocks.{stage}.{block}.conv_pw.weight, ...), so running
``utils/torch_import.import_backbone_weights`` on it exercises the exact code
path a real timm checkpoint would take: OIHW->HWIO transposes, depthwise
kernel layout, SE naming, BN parameter/stat split.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

# (block_type, repeats, stride, expand, out_channels) per timm flat stage;
# grouped for the FPN by the reference split indices [1, 2, 3, 5, 7]
V2S_STAGES = [
    ("er", 2, 1, 1, 24),
    ("er", 4, 2, 4, 48),
    ("er", 4, 2, 4, 64),
    ("ir", 6, 2, 4, 128),
    ("ir", 9, 1, 6, 160),
    ("ir", 15, 2, 6, 272),
]
STEM_CHANNELS = 24
SE_RATIO = 0.25


class EdgeResidualT(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int, expand: int):
        super().__init__()
        mid = in_ch * expand
        self.conv_exp = nn.Conv2d(in_ch, mid, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_exp(x)))
        y = self.bn2(self.conv_pwl(y))
        return x + y if self.has_residual else y


class SqueezeExciteT(nn.Module):
    def __init__(self, mid: int, rd: int):
        super().__init__()
        self.conv_reduce = nn.Conv2d(mid, rd, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd, mid, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class InvertedResidualT(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int, expand: int):
        super().__init__()
        mid = in_ch * expand
        rd = max(1, int(in_ch * SE_RATIO))
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, 3, stride, 1, groups=mid,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = SqueezeExciteT(mid, rd)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_pw(x)))
        y = F.silu(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.has_residual else y


class TorchTrunk(nn.Module):
    """EfficientNetV2-rw-s trunk with timm state_dict keys."""

    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, STEM_CHANNELS, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(STEM_CHANNELS)
        blocks = []
        in_ch = STEM_CHANNELS
        for btype, repeats, stride, expand, out_ch in V2S_STAGES:
            stage = []
            for r in range(repeats):
                s = stride if r == 0 else 1
                cls = EdgeResidualT if btype == "er" else InvertedResidualT
                stage.append(cls(in_ch, out_ch, s, expand))
                in_ch = out_ch
            blocks.append(nn.ModuleList(stage))
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        """Returns per-FPN-group features [f2, f4, f8, f16, f32] — stages
        3 and 4 form one group (reference split indices [1,2,3,5,7])."""
        x = F.silu(self.bn1(self.conv_stem(x)))
        feats = []
        for si, stage in enumerate(self.blocks):
            for block in stage:
                x = block(x)
            if si != 3:  # group stages 3+4 (both at /16)
                feats.append(x)
        return feats


class TorchFPN(nn.Module):
    """Mirror of TemporalStereoBackbone's top-down decoder (flax side:
    models/backbone.py __call__)."""

    def __init__(self, trunk_channels=(24, 48, 64, 160, 272),
                 out_channels=(0, 64, 128, 256, 320)):
        super().__init__()
        tc, oc = trunk_channels, out_channels
        self.conv32 = nn.Conv2d(tc[4], oc[4], 3, 1, 1, bias=False)
        self.deconv32_16_0 = nn.Conv2d(oc[4] + tc[3], oc[3], 3, 1, 1,
                                       bias=False)
        self.bn32_16 = nn.BatchNorm2d(oc[3])
        self.deconv32_16_1 = nn.Conv2d(oc[3], oc[3], 3, 1, 1, bias=False)
        self.deconv16_8_0 = nn.Conv2d(oc[3] + tc[2], oc[2], 3, 1, 1,
                                      bias=False)
        self.bn16_8 = nn.BatchNorm2d(oc[2])
        self.deconv16_8_1 = nn.Conv2d(oc[2], oc[2], 3, 1, 1, bias=False)
        self.deconv8_4_0 = nn.Conv2d(oc[2] + tc[1], oc[1], 3, 1, 1,
                                     bias=False)
        self.bn8_4 = nn.BatchNorm2d(oc[1])
        self.deconv8_4_1 = nn.Conv2d(oc[1], oc[1], 3, 1, 1, bias=False)

    def forward(self, feats):
        _, x4, x8, x16, x32 = feats
        x32 = self.conv32(x32)
        up = F.interpolate(x32, size=x16.shape[-2:], mode="bilinear",
                           align_corners=True)
        x16 = F.silu(self.bn32_16(self.deconv32_16_0(
            torch.cat([up, x16], dim=1))))
        x16 = self.deconv32_16_1(x16)
        up = F.interpolate(x16, size=x8.shape[-2:], mode="bilinear",
                           align_corners=True)
        x8 = F.silu(self.bn16_8(self.deconv16_8_0(
            torch.cat([up, x8], dim=1))))
        x8 = self.deconv16_8_1(x8)
        up = F.interpolate(x8, size=x4.shape[-2:], mode="bilinear",
                           align_corners=True)
        x4 = F.silu(self.bn8_4(self.deconv8_4_0(
            torch.cat([up, x4], dim=1))))
        x4 = self.deconv8_4_1(x4)
        return x4, x8, x16


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give every BN non-trivial running statistics and affine params so the
    eval-mode parity test actually exercises the imported stats."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
                m.weight.copy_(
                    torch.rand(m.weight.shape, generator=g) * 0.5 + 0.75)
                m.bias.copy_(
                    torch.randn(m.bias.shape, generator=g) * 0.1)
