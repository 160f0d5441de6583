"""Torch mirror of the reference's TEMPORAL machinery — update_map (pose
reprojection + softmax splatting), backbone channel-memory threading, and the
multi-frame forward loop — used by the temporal parity tests.

Implements the reference semantics independently (cited per function):
  * mesh_grid / project_to_3d with C-stacked depth maps
    (architecture/modeling/layers/inverse_warp.py:78-178)
  * softmax softsplat: bilinear scatter-add of exp(metric)-weighted values,
    normalized with +1e-22 (layers/softsplat.py:20-53, 334-359) — here a
    deterministic CPU scatter_add instead of CUDA atomicAdd
  * update_map: update_past_cost + update_local_map with the grow-then-
    truncate local map (projects/TemporalStereo/TemporalStereo.py:326-461)
  * the per-frame forward ordering backbone -> update_map -> aggregation
    (TemporalStereo.py:282-324) and the multi_frame loop (:250-280)
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_mirror_agg import AggregationT, BackboneT, TINY_STAGES

EXPMAX = 50.0  # metric clamp before exp() (TemporalStereo.py:5)


def mesh_grid_t(b, h, w, dtype=torch.float32):
    """inverse_warp.py:78-90: [B, 2, H, W] (x, y) pixel coordinates."""
    x = torch.arange(0, w, dtype=dtype).view(1, 1, 1, w).expand(b, 1, h, w)
    y = torch.arange(0, h, dtype=dtype).view(1, 1, h, 1).expand(b, 1, h, w)
    return torch.cat([x, y], dim=1)


def project_to_3d_t(depth, K, inv_K, T_target_to_source, eps=1e-7):
    """inverse_warp.py:92-178 (C-stacked depth maps)."""
    B, C, H, W = depth.shape
    dtype = depth.dtype
    pixel_coord = mesh_grid_t(B, H, W, dtype)
    ones = torch.ones(B, 1, H, W, dtype=dtype)
    homo = torch.cat([pixel_coord, ones], dim=1).view(B, 3, -1).repeat(
        1, 1, C)
    d = depth.reshape(B, -1).unsqueeze(1)
    points_3d = torch.matmul(inv_K[:, :3, :3], homo) * d
    homo_points = torch.cat(
        [points_3d, torch.ones(B, 1, C * H * W, dtype=dtype)], dim=1)

    new_K = torch.eye(4, dtype=dtype).unsqueeze(0).repeat(B, 1, 1)
    new_K[:, :3, :3] = K[:, :3, :3]
    P = torch.matmul(new_K, T_target_to_source)[:, :3, :]
    src = torch.matmul(P, homo_points)
    triangular_depth = src[:, -1, :].reshape(B, C, H, W)
    src_pixel = src[:, :2, :] / (src[:, 2:3, :] + eps)
    src_pixel = src_pixel.reshape(B, 2, C, H, W).permute(
        0, 2, 1, 3, 4).reshape(B, C * 2, H, W)
    flow = src_pixel - pixel_coord.repeat(1, C, 1, 1)
    return {"triangular_depth": triangular_depth, "optical_flow": flow}


def _summation_splat_t(inputs, flow):
    """Forward bilinear scatter-add (softsplat.py kernel :20-53), CPU
    deterministic via index_put_(accumulate=True)."""
    B, C, H, W = inputs.shape
    grid = mesh_grid_t(B, H, W, inputs.dtype)
    ox = grid[:, 0] + flow[:, 0]          # [B, H, W]
    oy = grid[:, 1] + flow[:, 1]
    x0 = torch.floor(ox)
    y0 = torch.floor(oy)
    out = torch.zeros_like(inputs)
    bidx = torch.arange(B).view(B, 1, 1).expand(B, H, W)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = (x0 + dx).long()
        yi = (y0 + dy).long()
        wgt = ((1 - (ox - x0) if dx == 0 else ox - x0)
               * (1 - (oy - y0) if dy == 0 else oy - y0))
        m = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        vb, vy, vx = bidx[m], yi[m], xi[m]
        contrib = inputs[:, :, :, :].permute(0, 2, 3, 1)[m] * wgt[m][:, None]
        flat = out.permute(0, 2, 3, 1).reshape(B * H * W, C)
        flat.index_put_((vb * H * W + vy * W + vx,), contrib,
                        accumulate=True)
        out = flat.view(B, H, W, C).permute(0, 3, 1, 2)
    return out


def softsplat_t(inputs, flow, metric, mode="softmax"):
    """FunctionSoftsplat (softsplat.py:334-359)."""
    assert mode == "softmax"
    e = metric.exp()
    vals = torch.cat([inputs * e, e], dim=1)
    out = _summation_splat_t(vals, flow)
    return out[:, :-1] / (out[:, -1:] + 1e-22)


def _down_K(K, factor):
    return torch.cat([K[:, 0:1, :] / factor, K[:, 1:2, :] / factor,
                      K[:, 2:, :]], dim=1)


def update_map_t(prev_info, K, baseline, T_past_to_now, full_hw,
                 use_past_cost, local_map_size):
    """Reference update_map (TemporalStereo.py:326-461): warp the carried
    cost memory and local map into the current camera."""
    full_h, full_w = full_hw
    bl = baseline.view(-1, 1, 1, 1)
    prev_disp = prev_info["prev_disp"].detach()

    def project_and_splat(stack_disp, h, w, pd):
        dK = _down_K(K, full_w / w)
        inv_K = torch.inverse(dK)
        focal = dK[:, 0, 0].view(-1, 1, 1, 1)
        depth = bl * focal / (stack_disp + 1e-5)
        prev_depth = bl * focal / (pd + 1e-5)
        flow = project_to_3d_t(prev_depth, dK, inv_K,
                               T_past_to_now)["optical_flow"][:, :2]
        td = project_to_3d_t(depth, dK, inv_K,
                             T_past_to_now)["triangular_depth"]
        updated = bl * focal / (td + 1e-5)
        metric = (pd[:, :1] - pd[:, :1].mean()).clamp(-EXPMAX, EXPMAX)
        return updated, flow, metric

    if use_past_cost and prev_info.get("cost_memory") is not None:
        mem = prev_info["cost_memory"]
        ds = mem["disp_sample"].detach()
        cv = mem["cost_volume"].detach()
        k = ds.shape[1]
        h, w = ds.shape[-2:]
        pd = F.interpolate(prev_disp * w / prev_disp.shape[-1], size=(h, w),
                           mode="bilinear", align_corners=True)
        updated, flow, metric = project_and_splat(ds, h, w, pd)
        warped = softsplat_t(torch.cat([updated, cv], dim=1), flow, metric)
        prev_info["cost_memory"] = {
            "disp_sample": warped[:, :k].detach(),
            "cost_volume": warped[:, k:].detach(),
        }

    if local_map_size > 0:
        h, w = full_h // 8, full_w // 8
        pd = F.interpolate(prev_disp * w / prev_disp.shape[-1], size=(h, w),
                           mode="bilinear", align_corners=True)
        local_map = prev_info.get("local_map", None)
        if local_map is None:
            stack = pd
        else:
            stack = torch.cat([pd, local_map], dim=1)[:, :local_map_size]
        updated, flow, metric = project_and_splat(stack, h, w, pd)
        prev_info["local_map"] = softsplat_t(updated, flow, metric).detach()

    return prev_info


class TemporalReferenceModelT(nn.Module):
    """Temporal reference model: backbone with channel memories + update_map
    + aggregation with cost-memory/local-map fusion, stepped frame by frame
    (TemporalStereo.py forward :282-324 / multi_frame_forward :250-280)."""

    def __init__(self, stages=TINY_STAGES, stem=24,
                 trunk_channels=(24, 32, 40, 56, 64),
                 out_channels=(0, 64, 128, 256, 96),
                 agg_cfg=((256, 8), (128, 8), (64, 8)),
                 memory_percent=0.5, use_past_cost=True, local_map_size=0):
        super().__init__()
        self.backbone = BackboneT(stages, stem, trunk_channels, out_channels)
        self.aggregation = AggregationT(agg_cfg)
        self.memory_percent = memory_percent
        self.use_past_cost = use_past_cost
        self.local_map_size = local_map_size

    def forward_frame(self, left_image, right_image, prev_info, K=None,
                      baseline=None, T_past_to_now=None):
        """One frame; ``prev_info`` is {} for the first frame.  Returns
        (full-res disps, new prev_info)."""
        b, _, H, W = left_image.shape
        lr = torch.cat([left_image, right_image], dim=0)
        (x4, x8, x16), new_mem = self.backbone(
            lr, prev_info.get("memories", []), self.memory_percent)
        prev_info["memories"] = new_mem
        l_fms = [x4[:b], x8[:b], x16[:b]]
        r_fms = [x4[b:], x8[b:], x16[b:]]

        if T_past_to_now is not None and "prev_disp" in prev_info:
            prev_info = update_map_t(
                prev_info, K, baseline, T_past_to_now, (H, W),
                self.use_past_cost, self.local_map_size)

        cost_memory = (prev_info.get("cost_memory")
                       if self.use_past_cost and "prev_disp" in prev_info
                       else None)
        local_map = (prev_info.get("local_map")
                     if self.local_map_size > 0 else None)
        disps, new_memory = self.aggregation(
            l_fms, r_fms, left_image, right_image, cost_memory, local_map)

        prev_info["prev_disp"] = disps[0].detach()
        prev_info["cost_memory"] = {k: v.detach()
                                    for k, v in new_memory.items()}
        full = []
        for d in disps:
            dw = d.shape[-1]
            full.append(F.interpolate(d * (W / dw), size=(H, W),
                                      mode="bilinear", align_corners=True))
        return full, prev_info

    def multi_frame(self, lefts, rights, K, baseline, T_cam, inv_T):
        """Ascending-timestamp loop with pose chaining
        T_past_to_now[t] = T[t] @ inv_T[t-1] (:335-338, :250-280)."""
        prev_info = {}
        full = None
        for t in range(lefts.shape[0]):
            tp2n = (torch.bmm(T_cam[t], inv_T[t - 1]) if t > 0 else None)
            with torch.no_grad():
                full, prev_info = self.forward_frame(
                    lefts[t], rights[t], prev_info, K, baseline, tp2n)
        return full, prev_info
