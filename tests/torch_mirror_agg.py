"""Torch mirror of the reference TemporalStereo FULL model __init__ (module
structure only, no forward) — used by the full-checkpoint import test.

Reproduces the reference's exact module composition so ``state_dict()``
yields the same key layout a real reference Lightning checkpoint has:
  * Conv wrappers holding ``.norm`` (basic_layers.py)
  * DepthwiseConv3D / DepthwiseConvTranspose3D = ``conv`` Sequentials
    (module.py:111-184)
  * ResidualBlock3D conv1..6 + shortcut5/6 (module.py:224-266)
  * PredictionHeads cost_head/off_head Sequentials (module.py:368-378)
  * PyramidFusion conv_5x5 / conv_fuse (module.py:408-409)
  * ConvexUpsample plain ``mask`` Sequential (module.py:310-316)
  * UNet conv2/conv4/fuse/deconv4/concat/deconv2 (module.py:435-457)
  * Coarse/Fine/Precise module sets with the reference cost_planes formulas
    (coarse.py:35, fine.py:35, precise.py:31)
  * the backbone FPN decoder (backbone/TemporalStereo.py:78-90) and the
    trunk regrouped as block{G}.{S}.{B} (:66-72)
"""
from __future__ import annotations

import torch
import torch.nn as nn

from tests.torch_mirror import EdgeResidualT, InvertedResidualT, V2S_STAGES

TINY_STAGES = [
    ("er", 1, 1, 1, 24),
    ("er", 1, 2, 2, 32),
    ("er", 1, 2, 2, 40),
    ("ir", 2, 2, 2, 48),
    ("ir", 2, 1, 2, 56),
    ("ir", 2, 2, 2, 64),
]


def _bn3d(c):
    return nn.BatchNorm3d(c)


class Conv2dW(nn.Conv2d):
    """Reference Conv2d wrapper: conv params + .norm submodule."""

    def __init__(self, i, o, k=3, s=1, p=1, bias=False, norm=True):
        super().__init__(i, o, k, s, p, bias=bias)
        self.norm = nn.BatchNorm2d(o) if norm else None


class Conv3dW(nn.Conv3d):
    def __init__(self, i, o, k, s, p, bias=False, norm=True):
        super().__init__(i, o, k, s, p, bias=bias)
        self.norm = _bn3d(o) if norm else None


class ConvT3dW(nn.ConvTranspose3d):
    def __init__(self, i, o, k, s, p, op, bias=False, norm=True):
        super().__init__(i, o, k, s, p, output_padding=op, bias=bias)
        self.norm = _bn3d(o) if norm else None


class ConvT2dW(nn.ConvTranspose2d):
    def __init__(self, i, o, k, s, p, bias=True, norm=True):
        super().__init__(i, o, k, s, p, bias=bias)
        self.norm = nn.BatchNorm2d(o) if norm else None


class DW3D(nn.Module):
    def __init__(self, i, o, k=3, s=1, p=1, d=1, bias=False):
        super().__init__()
        self.conv = nn.Sequential(
            Conv3dW(i, o, (1, k, k), (1, s, s), (0, p, p), bias=bias),
            Conv3dW(o, o, (k, 1, 1), (s, 1, 1), (p, 0, 0), bias=bias),
        )


class DWT3D(nn.Module):
    def __init__(self, i, o, k=3, s=2, p=1, op=1):
        super().__init__()
        self.conv = nn.Sequential(
            ConvT3dW(i, o, (1, k, k), (1, s, s), (0, p, p), (0, op, op)),
            ConvT3dW(o, o, (k, 1, 1), (s, 1, 1), (p, 0, 0), (op, 0, 0)),
        )


class ResidualBlock3DT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = DW3D(c, 2 * c, s=2)
        self.conv2 = DW3D(2 * c, 2 * c, s=1)
        self.conv3 = DW3D(2 * c, 2 * c, s=2)
        self.conv4 = DW3D(2 * c, 2 * c, s=1)
        self.conv5 = DWT3D(2 * c, 2 * c)
        self.conv6 = DWT3D(2 * c, c)
        self.shortcut5 = DW3D(2 * c, 2 * c, s=1)
        self.shortcut6 = DW3D(c, c, s=1)


class PredictionHeadsT(nn.Module):
    def __init__(self, c):
        super().__init__()
        def head():
            return nn.Sequential(
                Conv3dW(c, c, (3, 1, 1), 1, (1, 0, 0)),
                Conv3dW(c, 1, (1, 3, 3), 1, (0, 1, 1), norm=False),
            )
        self.cost_head = head()
        self.off_head = head()


class PyramidFusionT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv_5x5 = Conv3dW(c, c, (5, 1, 1), 1, (2, 0, 0))
        self.conv_fuse = DW3D(4 * c, c)


class ConvexUpsampleT(nn.Module):
    def __init__(self, in_planes, up=2, win=3):
        super().__init__()
        self.mask = nn.Sequential(
            nn.Conv2d(in_planes, 64, 3, 1, 1, bias=True),
            nn.BatchNorm2d(64),
            nn.SiLU(inplace=True),
            nn.Conv2d(64, win * win * up * up, 1, bias=True),
        )


class UNetT(nn.Module):
    def __init__(self, out_planes, C=32):
        super().__init__()
        self.conv2 = nn.Sequential(Conv2dW(3, C, s=2), Conv2dW(C, C))
        self.conv4 = nn.Sequential(Conv2dW(C, out_planes, s=2),
                                   Conv2dW(out_planes, out_planes))
        self.fuse = nn.Sequential(Conv2dW(out_planes * 2, C), Conv2dW(C, C))
        self.deconv4 = ConvT2dW(C, C, 4, 2, 1)
        self.concat = Conv2dW(C * 2, C)
        self.deconv2 = nn.ConvTranspose2d(C, 9, 4, 2, 1)


def _init3d(cost_planes, C):
    return nn.Sequential(
        DW3D(cost_planes, C, bias=True),
        ResidualBlock3DT(C),
        DW3D(C, C),
    )


class CoarseT(nn.Module):
    def __init__(self, in_planes, C, scale=3):
        super().__init__()
        self.init3d = _init3d(in_planes + scale * in_planes // 8, C)
        self.past_conv = Conv3dW(1, C, (1, 1, 1), 1, 0)
        self.fuse = PyramidFusionT(C)
        self.pred_heads = PredictionHeadsT(C)
        self.convex_upsample = ConvexUpsampleT(in_planes)


class FineT(nn.Module):
    def __init__(self, in_planes, C, scale=3):
        super().__init__()
        self.phi = nn.Parameter(torch.zeros(1))
        self.init3d = _init3d(2 * in_planes + scale * in_planes // 8, C)
        self.past_conv = Conv3dW(1, C, (1, 1, 1), 1, 0)
        self.fuse = PyramidFusionT(C)
        self.pred_heads = PredictionHeadsT(C)
        self.convex_upsample = ConvexUpsampleT(in_planes)


class PreciseT(nn.Module):
    def __init__(self, in_planes, C, scale=3):
        super().__init__()
        self.init3d = _init3d(4 * in_planes + scale * 2 * in_planes // 8, C)
        self.pred_heads = PredictionHeadsT(C)
        self.refinement = UNetT(out_planes=in_planes)


class AggregationT(nn.Module):
    def __init__(self, cfg=((256, 8), (128, 8), (64, 8))):
        super().__init__()
        self.coarse = CoarseT(*cfg[0])
        self.fine = FineT(*cfg[1])
        self.precise = PreciseT(*cfg[2])


class BackboneT(nn.Module):
    """Trunk regrouped per the reference split [1,2,3,5,7] + FPN decoder."""

    def __init__(self, stages=V2S_STAGES, stem=24,
                 trunk_channels=(24, 48, 64, 160, 272),
                 out_channels=(0, 64, 128, 256, 320)):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem)
        group_of_stage = [0, 1, 2, 3, 3, 4]
        blocks_per_group = {}
        in_ch = stem
        for si, (btype, repeats, stride, expand, out_ch) in enumerate(stages):
            stage = []
            for r in range(repeats):
                s = stride if r == 0 else 1
                cls = EdgeResidualT if btype == "er" else InvertedResidualT
                stage.append(cls(in_ch, out_ch, s, expand))
                in_ch = out_ch
            blocks_per_group.setdefault(group_of_stage[si], []).append(
                nn.Sequential(*stage))
        for g, stages_in_g in blocks_per_group.items():
            setattr(self, f"block{g}", nn.Sequential(*stages_in_g))

        tc, oc = trunk_channels, out_channels
        self.conv32 = Conv2dW(tc[4], oc[4], norm=False)
        self.deconv32_16 = nn.Sequential(
            Conv2dW(oc[4] + tc[3], oc[3]), Conv2dW(oc[3], oc[3], norm=False))
        self.deconv16_8 = nn.Sequential(
            Conv2dW(oc[3] + tc[2], oc[2]), Conv2dW(oc[2], oc[2], norm=False))
        self.deconv8_4 = nn.Sequential(
            Conv2dW(oc[2] + tc[1], oc[1]), Conv2dW(oc[1], oc[1], norm=False))


class ReferenceModelT(nn.Module):
    """state_dict layout of the reference TemporalStereo LightningModule."""

    def __init__(self, stages=TINY_STAGES, stem=24,
                 trunk_channels=(24, 32, 40, 56, 64),
                 out_channels=(0, 64, 128, 256, 96),
                 agg_cfg=((256, 8), (128, 8), (64, 8))):
        super().__init__()
        self.backbone = BackboneT(stages, stem, trunk_channels, out_channels)
        self.aggregation = AggregationT(agg_cfg)
