"""Torch mirror of the reference TemporalStereo FULL model — module structure
AND forward semantics — used by the full-checkpoint-import test and the
full-model forward-parity test.

Reproduces the reference's exact composition so ``state_dict()`` has the key
layout of a real reference Lightning checkpoint, and implements the
reference's forward semantics independently (cited per module):
  * Conv wrappers with fused ``.norm``/activation (basic_layers.py)
  * DepthwiseConv3D / DepthwiseConvTranspose3D ``conv`` Sequentials
    (module.py:111-184)
  * ResidualBlock3D hourglass with trilinear-resize skips (module.py:224-297)
  * PredictionHeads with tanh/100 offset squash (module.py:356-398)
  * PyramidFusion 5x5x5 pool fusion (module.py:401-421)
  * ConvexUpsample RAFT-style mask upsample (module.py:300-353)
  * UNet encoder/decoder with 9-way mask upsample (module.py:424-492)
  * block_cost int/tensor paths + multi-scale groupwise correlation
    (block_cost.py:16-83), inverse_warp_3d 5D grid_sample
    (inverse_warp_3d.py:4-57)
  * Coarse/Fine/Precise stage forwards + the +/-4 cascade driver
    (coarse.py:77-116, fine.py:97-132, precise.py:81-105,
    TemporalStereo.py:97-135), with the reference cost_planes formulas
  * backbone trunk regrouped as block{G}.{S}.{B} + FPN decoder
    (backbone/TemporalStereo.py:62-90, 101-140)
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_mirror import EdgeResidualT, InvertedResidualT, V2S_STAGES

TINY_STAGES = [
    ("er", 1, 1, 1, 24),
    ("er", 1, 2, 2, 32),
    ("er", 1, 2, 2, 40),
    ("ir", 2, 2, 2, 48),
    ("ir", 2, 1, 2, 56),
    ("ir", 2, 2, 2, 64),
]


def _act(kind):
    if kind is None:
        return lambda x: x
    return {"silu": F.silu, "relu": F.relu}[kind]


class Conv2dW(nn.Conv2d):
    """Reference Conv2d wrapper: conv params + .norm + activation."""

    def __init__(self, i, o, k=3, s=1, p=1, bias=False, norm=True,
                 act="silu"):
        super().__init__(i, o, k, s, p, bias=bias)
        self.norm = nn.BatchNorm2d(o) if norm else None
        self.act = act

    def forward(self, x):
        y = super().forward(x)
        if self.norm is not None:
            y = self.norm(y)
        return _act(self.act)(y)


class Conv3dW(nn.Conv3d):
    def __init__(self, i, o, k, s, p, d=1, bias=False, norm=True,
                 act="silu"):
        super().__init__(i, o, k, s, p, dilation=d, bias=bias)
        self.norm = nn.BatchNorm3d(o) if norm else None
        self.act = act

    def forward(self, x):
        y = super().forward(x)
        if self.norm is not None:
            y = self.norm(y)
        return _act(self.act)(y)


class ConvT3dW(nn.ConvTranspose3d):
    def __init__(self, i, o, k, s, p, op, bias=False, norm=True, act=None):
        super().__init__(i, o, k, s, p, output_padding=op, bias=bias)
        self.norm = nn.BatchNorm3d(o) if norm else None
        self.act = act

    def forward(self, x):
        y = super().forward(x)
        if self.norm is not None:
            y = self.norm(y)
        return _act(self.act)(y)


class ConvT2dW(nn.ConvTranspose2d):
    def __init__(self, i, o, k, s, p, bias=True, norm=True, act="relu"):
        super().__init__(i, o, k, s, p, bias=bias)
        self.norm = nn.BatchNorm2d(o) if norm else None
        self.act = act

    def forward(self, x):
        y = super().forward(x)
        if self.norm is not None:
            y = self.norm(y)
        return _act(self.act)(y)


class DW3D(nn.Module):
    """Factorized (1,k,k)+(k,1,1) 3D conv pair (module.py:111-147)."""

    def __init__(self, i, o, k=3, s=1, p=1, d=1, bias=False, act="silu"):
        super().__init__()
        self.conv = nn.Sequential(
            Conv3dW(i, o, (1, k, k), (1, s, s), (0, p, p), (1, d, d),
                    bias=bias, act=act),
            Conv3dW(o, o, (k, 1, 1), (s, 1, 1), (p, 0, 0), (d, 1, 1),
                    bias=bias, act=act),
        )

    def forward(self, x):
        return self.conv(x)


class DWT3D(nn.Module):
    def __init__(self, i, o, k=3, s=2, p=1, op=1, act=None):
        super().__init__()
        self.conv = nn.Sequential(
            ConvT3dW(i, o, (1, k, k), (1, s, s), (0, p, p), (0, op, op),
                     act=act),
            ConvT3dW(o, o, (k, 1, 1), (s, 1, 1), (p, 0, 0), (op, 0, 0),
                     act=act),
        )

    def forward(self, x):
        return self.conv(x)


class ResidualBlock3DT(nn.Module):
    """module.py:224-297."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = DW3D(c, 2 * c, s=2)
        self.conv2 = DW3D(2 * c, 2 * c, s=1)
        self.conv3 = DW3D(2 * c, 2 * c, s=2)
        self.conv4 = DW3D(2 * c, 2 * c, s=1, act=None)
        self.conv5 = DWT3D(2 * c, 2 * c)
        self.conv6 = DWT3D(2 * c, c)
        self.shortcut5 = DW3D(2 * c, 2 * c, s=1, act=None)
        self.shortcut6 = DW3D(c, c, s=1, act=None)

    def forward(self, x):
        out = self.conv1(x)
        pre = self.conv2(out)
        out = self.conv4(self.conv3(pre))
        out = F.silu(out)
        out = self.conv5(out)
        out = F.interpolate(out, size=pre.shape[-3:], mode="trilinear",
                            align_corners=True)
        out = F.silu(out + self.shortcut5(pre))
        out = self.conv6(out)
        out = F.interpolate(out, size=x.shape[-3:], mode="trilinear",
                            align_corners=True)
        return F.silu(out + self.shortcut6(x))


class PredictionHeadsT(nn.Module):
    """module.py:356-398."""

    def __init__(self, c, delta=1.0):
        super().__init__()
        self.delta = delta

        def head():
            return nn.Sequential(
                Conv3dW(c, c, (3, 1, 1), 1, (1, 0, 0)),
                Conv3dW(c, 1, (1, 3, 3), 1, (0, 1, 1), norm=False, act=None),
            )
        self.cost_head = head()
        self.off_head = head()

    def forward(self, init_cost):
        off = self.off_head(init_cost).squeeze(1)
        off = torch.tanh(off / 100).clamp(-1, 1) * self.delta
        cost = self.cost_head(init_cost).squeeze(1)
        return cost, off


class PyramidFusionT(nn.Module):
    """module.py:401-421."""

    def __init__(self, c):
        super().__init__()
        self.conv_5x5 = Conv3dW(c, c, (5, 1, 1), 1, (2, 0, 0))
        self.conv_fuse = DW3D(4 * c, c, act=None)

    def forward(self, cost):
        cat = torch.cat([
            cost,
            self.conv_5x5(cost),
            F.avg_pool3d(cost, 5, stride=1, padding=2),
            F.max_pool3d(cost, 5, stride=1, padding=2),
        ], dim=1)
        return self.conv_fuse(cat)


class ConvexUpsampleT(nn.Module):
    """module.py:300-353."""

    def __init__(self, in_planes, up=2, win=3):
        super().__init__()
        self.up, self.win = up, win
        self.mask = nn.Sequential(
            nn.Conv2d(in_planes, 64, 3, 1, 1, bias=True),
            nn.BatchNorm2d(64),
            nn.SiLU(inplace=True),
            nn.Conv2d(64, win * win * up * up, 1, bias=True),
        )

    def forward(self, feat, disp):
        b, c, h, w = disp.shape
        up, win = self.up, self.win
        mask = self.mask(feat).view(b, 1, win * win, up, up, h, w)
        mask = torch.softmax(mask, dim=2)
        patches = F.unfold(disp * up, kernel_size=win, padding=win // 2)
        patches = patches.view(b, c, win * win, 1, 1, h, w)
        out = torch.sum(mask * patches, dim=2)
        out = out.permute(0, 1, 4, 2, 5, 3).reshape(b, c, h * up, w * up)
        return out


class UNetT(nn.Module):
    """module.py:424-492 (activation forced to ReLU)."""

    def __init__(self, out_planes, C=32):
        super().__init__()
        r = dict(act="relu")
        self.conv2 = nn.Sequential(Conv2dW(3, C, s=2, **r),
                                   Conv2dW(C, C, **r))
        self.conv4 = nn.Sequential(Conv2dW(C, out_planes, s=2, **r),
                                   Conv2dW(out_planes, out_planes, **r))
        self.fuse = nn.Sequential(Conv2dW(out_planes * 2, C, **r),
                                  Conv2dW(C, C, **r))
        self.deconv4 = ConvT2dW(C, C, 4, 2, 1, act="relu")
        self.concat = Conv2dW(C * 2, C, **r)
        self.deconv2 = nn.ConvTranspose2d(C, 9, 4, 2, 1)

    def encoder(self, imL, imR):
        spx2l = self.conv2(imL)
        spx4l = self.conv4(spx2l)
        spx2r = self.conv2(imR)
        spx4r = self.conv4(spx2r)
        return [spx2l, spx4l], [spx2r, spx4r]

    def decoder(self, disp, feat, feat2x):
        f = self.deconv4(self.fuse(feat))
        f = self.concat(torch.cat([f, feat2x], dim=1))
        mask = torch.softmax(self.deconv2(f), dim=1)
        b, _, h, w = mask.shape
        dh, dw = disp.shape[-2:]
        patches = F.unfold(disp, kernel_size=3, padding=1).view(b, 9, dh, dw)
        patches = F.interpolate(patches * w / dw, size=(h, w),
                                mode="bilinear", align_corners=True)
        return torch.sum(patches * mask, dim=1, keepdim=True)


# ---------------------------------------------------------------- cost ops

def inverse_warp_3d_t(img5d, disp):
    """inverse_warp_3d.py:4-57 (zeros padding, align_corners=True)."""
    b, c, d, h, w = img5d.shape
    dev = disp.device
    gd = torch.linspace(0, d - 1, d, device=dev).view(1, d, 1, 1).expand(
        b, d, h, w)
    gh = torch.linspace(0, h - 1, h, device=dev).view(1, 1, h, 1).expand(
        b, d, h, w)
    gw = torch.linspace(0, w - 1, w, device=dev).view(1, 1, 1, w).expand(
        b, d, h, w) + disp
    grid = torch.stack([
        gw / max(w - 1, 1) * 2 - 1,
        gh / max(h - 1, 1) * 2 - 1,
        gd / max(d - 1, 1) * 2 - 1,
    ], dim=4)
    return F.grid_sample(img5d, grid, padding_mode="zeros",
                         align_corners=True)


def groupwise_correlation_t(a, b):
    """block_cost.py:6-13."""
    B, C, D, H, W = a.shape
    g = C // 8
    return -((a - b) ** 2).view(B, g, 8, D, H, W).sum(2)


def block_cost_t(ref, tgt, disp_sample, scale=3):
    """block_cost.py:16-83."""
    B, C, H, W = ref.shape
    if isinstance(disp_sample, int):
        d = disp_sample
        shifted = [tgt]
        for k in range(1, d):
            shifted.append(F.pad(tgt, (k, 0))[:, :, :, :W])
        tgt5 = torch.stack(shifted, dim=2)
        ref5 = ref.unsqueeze(2).expand(B, C, d, H, W)
        cost = -(ref5 - tgt5) ** 2
    else:
        d = disp_sample.shape[1]
        ref5 = ref.unsqueeze(2).expand(B, C, d, H, W)
        tgt5 = inverse_warp_3d_t(
            tgt.unsqueeze(2).expand(B, C, d, H, W), -disp_sample)
        cost = torch.cat([ref5, tgt5], dim=1)
    costs = [cost]
    for s in range(scale):
        sh, sw = min(2 ** s, H), min(2 ** s, W)
        ra = F.avg_pool3d(ref5, (1, sh, sw), stride=(1, sh, sw))
        ta = F.avg_pool3d(tgt5, (1, sh, sw), stride=(1, sh, sw))
        corr = groupwise_correlation_t(ra, ta)
        corr = F.interpolate(corr, size=(d, H, W), mode="trilinear",
                             align_corners=True)
        costs.append(corr)
    return torch.cat(costs, dim=1)


def predict_disp_t(cost, disp_sample, off, k=2):
    """coarse.py:69-75."""
    topk_cost, idx = torch.topk(cost, k=k, dim=1)
    prob = torch.softmax(topk_cost, dim=1)
    topk_disp = torch.gather(disp_sample + off, dim=1, index=idx)
    return (torch.sum(prob * topk_disp, dim=1, keepdim=True), topk_disp,
            topk_cost)


def _fuse_memory(init_cost, disp_sample, mem_sample, mem_volume, past_conv,
                 C):
    """Memory fusion: embed with past_conv, concatenate as extra hypotheses,
    re-sort by disparity (coarse.py:98-105, fine.py:114-121; stable sort so
    ties keep insertion order, matching the flax rank sort)."""
    mem_volume = past_conv(mem_volume)
    disp_sample = torch.cat([disp_sample, mem_sample], dim=1)
    init_cost = torch.cat([init_cost, mem_volume], dim=2)
    disp_sample, idx = torch.sort(disp_sample, dim=1, stable=True)
    init_cost = torch.gather(
        init_cost, dim=2,
        index=idx.unsqueeze(1).repeat(1, C, 1, 1, 1))
    return disp_sample, init_cost


def _fuse_zero_memory(init_cost, disp_sample, past_conv, topk, C):
    """The memory-None branch: zero hypotheses (coarse.py:86-88)."""
    mem_sample = torch.zeros_like(disp_sample[:, :topk])
    mem_volume = torch.zeros_like(mem_sample).unsqueeze(1)
    return _fuse_memory(init_cost, disp_sample, mem_sample, mem_volume,
                        past_conv, C)


def _fractional_samples(low, high):
    """fine.py:78-95 / precise.py:69-79."""
    fr = torch.tensor([0, 3, 4, 5, 8], dtype=low.dtype,
                      device=low.device) / 8.0
    fr = fr.view(1, -1, 1, 1)
    return (high - low).abs() * fr + torch.min(low, high)


def _init3d(cost_planes, C):
    return nn.Sequential(
        DW3D(cost_planes, C, bias=True),
        ResidualBlock3DT(C),
        DW3D(C, C, p=2, d=2),
    )


class CoarseT(nn.Module):
    def __init__(self, in_planes, C, num_sample=12, scale=3, topk=2):
        super().__init__()
        self.C, self.num_sample, self.scale, self.topk = (C, num_sample,
                                                          scale, topk)
        self.init3d = _init3d(in_planes + scale * in_planes // 8, C)
        self.past_conv = Conv3dW(1, C, (1, 1, 1), 1, 0)
        self.fuse = PyramidFusionT(C)
        self.pred_heads = PredictionHeadsT(C)
        self.convex_upsample = ConvexUpsampleT(in_planes)

    def forward(self, left, right, memory=None):
        B, _, H, W = left.shape
        raw = block_cost_t(left, right, self.num_sample, self.scale)
        disp_sample = torch.linspace(
            0, self.num_sample - 1, self.num_sample,
            device=left.device).view(1, -1, 1, 1).expand(
            B, self.num_sample, H, W)
        init_cost = self.init3d(raw)
        if memory is None:
            disp_sample, init_cost = _fuse_zero_memory(
                init_cost, disp_sample, self.past_conv, self.topk, self.C)
        else:
            # re-grid the 1/8 memory to this 1/16 grid with value scaling
            # (coarse.py:92-96)
            ms = memory["disp_sample"]
            mw = ms.shape[-1]
            ms = F.interpolate(ms * W / mw, size=(H, W), mode="bilinear",
                               align_corners=True)
            mv = F.interpolate(memory["cost_volume"], size=(H, W),
                               mode="bilinear",
                               align_corners=True).unsqueeze(1)
            disp_sample, init_cost = _fuse_memory(
                init_cost, disp_sample, ms, mv, self.past_conv, self.C)
        init_cost = self.fuse(init_cost)
        cost, off = self.pred_heads(init_cost)
        disp, _, _ = predict_disp_t(cost, disp_sample, off, self.topk)
        return self.convex_upsample(left, disp), cost, off, disp_sample


class FineT(nn.Module):
    def __init__(self, in_planes, C, scale=3, topk=2):
        super().__init__()
        self.C, self.scale, self.topk = C, scale, topk
        self.phi = nn.Parameter(torch.zeros(1))
        self.init3d = _init3d(2 * in_planes + scale * in_planes // 8, C)
        self.past_conv = Conv3dW(1, C, (1, 1, 1), 1, 0)
        self.fuse = PyramidFusionT(C)
        self.pred_heads = PredictionHeadsT(C)
        self.convex_upsample = ConvexUpsampleT(in_planes)

    def forward(self, left, right, low, high, memory=None, local_map=None):
        disp_sample = _fractional_samples(low, high)
        if local_map is not None:
            # local-map disparities prepended as extra hypotheses
            # (fine.py:89-94)
            H, W = low.shape[-2:]
            lw = local_map.shape[-1]
            lm = F.interpolate(local_map * W / lw, size=(H, W),
                               mode="bilinear", align_corners=True)
            disp_sample = torch.cat([lm, disp_sample], dim=1)
        raw = block_cost_t(left, right, disp_sample, self.scale)
        init_cost = self.init3d(raw)
        if memory is None:
            disp_sample, init_cost = _fuse_zero_memory(
                init_cost, disp_sample, self.past_conv, self.topk, self.C)
        else:
            # fine consumes the 1/8 memory at its native grid (fine.py:114)
            disp_sample, init_cost = _fuse_memory(
                init_cost, disp_sample, memory["disp_sample"],
                memory["cost_volume"].unsqueeze(1), self.past_conv, self.C)
        init_cost = self.fuse(init_cost)
        cost, off = self.pred_heads(init_cost)
        disp, _, _ = predict_disp_t(cost, disp_sample, off, self.topk)
        return self.convex_upsample(left, disp), cost, off, disp_sample


class PreciseT(nn.Module):
    def __init__(self, in_planes, C, scale=3, topk=2):
        super().__init__()
        self.C, self.scale, self.topk = C, scale, topk
        self.init3d = _init3d(4 * in_planes + scale * 2 * in_planes // 8, C)
        self.pred_heads = PredictionHeadsT(C)
        self.refinement = UNetT(out_planes=in_planes)

    def forward(self, left, right, low, high, left_image, right_image):
        (spx2l, spx4l), (_, spx4r) = self.refinement.encoder(left_image,
                                                             right_image)
        left = torch.cat([left, spx4l], dim=1)
        right = torch.cat([right, spx4r], dim=1)
        disp_sample = _fractional_samples(low, high)
        raw = block_cost_t(left, right, disp_sample, self.scale)
        init_cost = self.init3d(raw)
        cost, off = self.pred_heads(init_cost)
        disp, mem_sample, mem_volume = predict_disp_t(
            cost, disp_sample, off, self.topk)
        full_disp = self.refinement.decoder(disp, left, spx2l)
        # next frame's cost memory: topk samples halved + costs, stored at
        # 1/8 (precise.py:98-103)
        new_memory = {
            "disp_sample": F.interpolate(mem_sample / 2, scale_factor=0.5,
                                         mode="bilinear",
                                         align_corners=True,
                                         recompute_scale_factor=False),
            "cost_volume": F.interpolate(mem_volume, scale_factor=0.5,
                                         mode="bilinear",
                                         align_corners=True,
                                         recompute_scale_factor=False),
        }
        return full_disp, disp, cost, off, disp_sample, new_memory


class AggregationT(nn.Module):
    """Cascade driver (aggregation/TemporalStereo/TemporalStereo.py:97-135)."""

    def __init__(self, cfg=((256, 8), (128, 8), (64, 8))):
        super().__init__()
        self.coarse = CoarseT(*cfg[0])
        self.fine = FineT(*cfg[1])
        self.precise = PreciseT(*cfg[2])

    def forward(self, left_feats, right_feats, left_image, right_image,
                cost_memory=None, local_map=None):
        l4, l8, l16 = left_feats
        r4, r8, r16 = right_feats
        disps = []
        disp, cost, off, sample = self.coarse(l16, r16, cost_memory)
        low, high = disp - 4, disp + 4
        disps.append(disp)
        disp, cost, off, sample = self.fine(l8, r8, low, high, cost_memory,
                                            local_map)
        low, high = disp - 4, disp + 4
        disps.append(disp)
        full_disp, disp, cost, off, sample, new_memory = self.precise(
            l4, r4, low, high, left_image, right_image)
        disps.extend([disp, full_disp])
        return disps[::-1], new_memory


def _ir_forward_mem(blk, x, memory, memory_percent):
    """InvertedResidual forward with the temporal channel-memory splice
    (reference _inverted_residual_forward, backbone/TemporalStereo.py:
    183-218): the first ``mc`` input channels are replaced by the previous
    frame's saved slice; the CURRENT slice becomes the new memory; the
    residual adds the un-spliced input."""
    mc = int(x.shape[1] * memory_percent)
    input1 = x[:, :mc]
    if memory is None:
        memory = input1
    h = torch.cat([memory, x[:, mc:]], dim=1)
    h = F.silu(blk.bn1(blk.conv_pw(h)))
    h = F.silu(blk.bn2(blk.conv_dw(h)))
    h = blk.se(h)
    h = blk.bn3(blk.conv_pwl(h))
    return x + h, input1


class BackboneT(nn.Module):
    """Trunk regrouped per the reference split [1,2,3,5,7] + FPN decoder
    (backbone/TemporalStereo.py:62-90, 101-140)."""

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
        self.conv32 = Conv2dW(tc[4], oc[4], norm=False, act=None)
        self.deconv32_16 = nn.Sequential(
            Conv2dW(oc[4] + tc[3], oc[3]),
            Conv2dW(oc[3], oc[3], norm=False, act=None))
        self.deconv16_8 = nn.Sequential(
            Conv2dW(oc[3] + tc[2], oc[2]),
            Conv2dW(oc[2], oc[2], norm=False, act=None))
        self.deconv8_4 = nn.Sequential(
            Conv2dW(oc[2] + tc[1], oc[1]),
            Conv2dW(oc[1], oc[1], norm=False, act=None))

    def forward(self, lr, memories=None, memory_percent=0.0):
        """``memories`` (reference _block_forward, backbone/
        TemporalStereo.py:165-180): None = non-temporal; [] = temporal frame
        with no carried state yet (each residual IR splices its own slice, a
        no-op, :191-195); a list = the previous frame's slices in visit
        order.  Returns (x4, x8, x16) or ((x4, x8, x16), new_memories)."""
        x = F.silu(self.bn1(self.conv_stem(lr)))
        feats = []
        new_memories = []
        mi = 0
        for g in range(5):
            if memories is None or memory_percent <= 0:
                x = getattr(self, f"block{g}")(x)
            else:
                for stage in getattr(self, f"block{g}"):
                    for blk in stage:
                        if (isinstance(blk, InvertedResidualT)
                                and blk.has_residual):
                            m = memories[mi] if len(memories) > 0 else None
                            x, saved = _ir_forward_mem(
                                blk, x, m, memory_percent)
                            new_memories.append(saved)
                            mi += 1
                        else:
                            x = blk(x)
            feats.append(x)
        _, x4, x8, x16, x32 = feats
        x32 = self.conv32(x32)
        up = F.interpolate(x32, size=x16.shape[-2:], mode="bilinear",
                           align_corners=True)
        x16 = self.deconv32_16(torch.cat([up, x16], dim=1))
        up = F.interpolate(x16, size=x8.shape[-2:], mode="bilinear",
                           align_corners=True)
        x8 = self.deconv16_8(torch.cat([up, x8], dim=1))
        up = F.interpolate(x8, size=x4.shape[-2:], mode="bilinear",
                           align_corners=True)
        x4 = self.deconv8_4(torch.cat([up, x4], dim=1))
        if memories is None or memory_percent <= 0:
            return x4, x8, x16
        return (x4, x8, x16), new_memories


class ReferenceModelT(nn.Module):
    """state_dict layout + single-frame forward of the reference
    TemporalStereo LightningModule (backbone + aggregation)."""

    def __init__(self, stages=TINY_STAGES, stem=24,
                 trunk_channels=(24, 32, 40, 56, 64),
                 out_channels=(0, 64, 128, 256, 96),
                 agg_cfg=((256, 8), (128, 8), (64, 8))):
        super().__init__()
        self.backbone = BackboneT(stages, stem, trunk_channels, out_channels)
        self.aggregation = AggregationT(agg_cfg)

    def forward(self, left_image, right_image):
        """Single-frame forward (TemporalStereo.py:282-324, prev=None):
        batched l/r through the trunk, cascade, all scales to full res with
        width-ratio value scaling (:305-309)."""
        b, _, H, W = left_image.shape
        lr = torch.cat([left_image, right_image], dim=0)
        x4, x8, x16 = self.backbone(lr)
        l_fms = [x4[:b], x8[:b], x16[:b]]
        r_fms = [x4[b:], x8[b:], x16[b:]]
        disps, _ = self.aggregation(l_fms, r_fms, left_image, right_image)
        full = []
        for d in disps:
            dw = d.shape[-1]
            full.append(F.interpolate(d * (W / dw), size=(H, W),
                                      mode="bilinear", align_corners=True))
        return full
