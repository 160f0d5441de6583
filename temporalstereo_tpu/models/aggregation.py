"""Coarse-to-fine cost aggregation cascade with temporal memory fusion.

TPU-native re-design of
``architecture/modeling/aggregation/TemporalStereo/``:
  * CoarseAggregation (coarse.py:13-116) — dense 12-sample cost @1/16
  * FineAggregation (fine.py:12-132) — 5 fractional samples + local-map
    hypotheses @1/8
  * PreciseAggregation (precise.py:11-105) — 5 samples + UNet image guidance
    @1/4, full-res decoder, writes the next frame's cost memory
  * the cascade driver (TemporalStereo.py:97-135)

Layouts: features [B,H,W,C]; volumes [B,D,H,W,C]; per-hypothesis maps
(cost / offset / disp_sample) sample-last [B,H,W,D].

Temporal state is threaded through a ``CostMemory`` pytree with a ``valid``
flag instead of dict-or-None, so one compiled graph serves frame 0 and
steady-state frames (the reference's ``memory is None`` branch zero-fills,
coarse.py:86-88 — identical semantics here with valid=False).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import (
    ConvexUpsample,
    DepthwiseConv3D,
    PredictionHeads,
    PyramidFusion,
    ResidualBlock3D,
    UNet,
)
from ..nn.layers import Conv3d, msra_init
from ..ops.cost import block_cost
from ..ops.interpolate import resize_bilinear
from ..ops.sampling import (
    fractional_disparity_samples,
    linear_disparity_samples,
    sort_samples_with_volume,
    topk_soft_argmin,
)
from ..utils.registry import AGGREGATION_REGISTRY


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CostMemory:
    """Warped cost memory carried between frames (precise.py:98-103).

    disp_sample / cost_volume: [B, H8, W8, topk]; valid gates fusion — when
    False both behave as zeros (reference coarse.py:86-88).
    """
    disp_sample: jnp.ndarray
    cost_volume: jnp.ndarray
    valid: jnp.ndarray  # scalar bool

    @staticmethod
    def zeros(b: int, h8: int, w8: int, topk: int, dtype=jnp.float32):
        # distinct buffers (not one aliased array): donating an aliased
        # input buffer is an XLA error, and streaming callers donate state
        z = jnp.zeros((b, h8, w8, topk), dtype)
        return CostMemory(z, jnp.zeros_like(z), jnp.zeros((), jnp.bool_))

    def gated(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        g = self.valid.astype(self.disp_sample.dtype)
        return self.disp_sample * g, self.cost_volume * g


def _fuse_memory(init_cost: jnp.ndarray, disp_sample: jnp.ndarray,
                 memory_sample: jnp.ndarray, memory_volume_raw: jnp.ndarray,
                 past_conv: Conv3d, c_planes: int, train: bool):
    """Embed the warped memory with past_conv, concatenate it as extra
    hypotheses, and re-sort by disparity (coarse.py:98-105, fine.py:114-121).

    memory_volume_raw: [B, H, W, topk] scalar costs -> volume [B, topk, H, W, 1]
    -> past_conv 1x1x1 -> [B, topk, H, W, C].
    """
    vol = memory_volume_raw.transpose(0, 3, 1, 2)[..., None]
    vol = past_conv(vol, train)
    init_cost = jnp.concatenate([init_cost, vol], axis=1)
    disp_sample = jnp.concatenate([disp_sample, memory_sample], axis=-1)
    return sort_samples_with_volume(disp_sample, init_cost)


class Init3D(nn.Module):
    """Initial volume regularizer: DepthwiseConv3D -> ResidualBlock3D ->
    dilated DepthwiseConv3D (coarse.py:36-40, identical in fine/precise)."""
    C: int
    norm: str = "BN3d"
    activation: Any = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DepthwiseConv3D(self.C, 3, 1, 1, use_bias=True, norm=self.norm,
                            activation=self.activation, dtype=self.dtype)(
            x, train)
        x = ResidualBlock3D(self.C, 3, 2, 1, norm=self.norm,
                            activation=self.activation, dtype=self.dtype)(
            x, train)
        x = DepthwiseConv3D(self.C, 3, 1, 2, dilation=2, use_bias=False,
                            norm=self.norm, activation=self.activation,
                            dtype=self.dtype)(x, train)
        return x


class CoarseAggregation(nn.Module):
    """Full-range cost aggregation @1/16 (coarse.py:13-116)."""
    in_planes: int
    C: int
    num_sample: int = 12
    delta: float = 1.0
    block_cost_scale: int = 3
    topk: int = 2
    spatial_fusion: bool = True
    norm: str = "BN3d"
    activation: Any = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray,
                 memory: Optional[CostMemory], train: bool = False):
        b, h, w, _ = left.shape
        raw_cost = block_cost(left, right, self.num_sample,
                              self.block_cost_scale)
        disp_sample = linear_disparity_samples(b, h, w, self.num_sample,
                                               left.dtype)
        init_cost = Init3D(self.C, self.norm, self.activation,
                           dtype=self.dtype)(raw_cost, train)

        if memory is None:
            mem_sample = jnp.zeros((b, h, w, self.topk), left.dtype)
            mem_volume = jnp.zeros((b, h, w, self.topk), left.dtype)
        else:
            ms, mv = memory.gated()
            mh, mw = ms.shape[1:3]
            # re-grid the 1/8 memory to this 1/16 grid (coarse.py:92-96)
            mem_sample = resize_bilinear(ms * (w / mw), (h, w))
            mem_volume = resize_bilinear(mv, (h, w))

        past_conv = Conv3d(self.C, (1, 1, 1), 1, 0, use_bias=False,
                           norm=self.norm, activation=self.activation,
                           kernel_init=msra_init(), dtype=self.dtype,
                           name="past_conv")
        disp_sample, init_cost = _fuse_memory(
            init_cost, disp_sample, mem_sample, mem_volume, past_conv,
            self.C, train)

        if self.spatial_fusion:
            init_cost = PyramidFusion(self.C, self.norm, self.activation,
                                      dtype=self.dtype)(init_cost, train)

        cost, off = PredictionHeads(self.C, self.delta, self.norm,
                                    self.activation, dtype=self.dtype)(
            init_cost, train)

        disp, _, _ = topk_soft_argmin(cost, disp_sample, off, self.topk)
        disp_up = ConvexUpsample(2, 3, dtype=self.dtype)(left, disp,
                                                         train=train)
        return disp_up, cost, off, disp_sample


class FineAggregation(nn.Module):
    """Sparse-sample aggregation @1/8 with local-map hypotheses
    (fine.py:12-132)."""
    in_planes: int
    C: int
    num_sample: int = 5
    delta: float = 1.0
    block_cost_scale: int = 3
    topk: int = 2
    spatial_fusion: bool = True
    norm: str = "BN3d"
    activation: Any = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray,
                 low: jnp.ndarray, high: jnp.ndarray,
                 memory: Optional[CostMemory],
                 local_map: Optional[jnp.ndarray],
                 train: bool = False):
        b, h, w, _ = left.shape
        # the learnable phi scalar exists in the reference but is unused in
        # its forward (fine.py:33) — kept for checkpoint-shape parity
        self.param("phi", nn.initializers.zeros, (1,))

        disp_sample = fractional_disparity_samples(low, high)
        if local_map is not None:
            lh, lw = local_map.shape[1:3]
            lm = resize_bilinear(local_map * (w / lw), (h, w))
            disp_sample = jnp.concatenate([lm, disp_sample], axis=-1)

        # sample-first layout for the volume constructor
        raw_cost = block_cost(left, right,
                              disp_sample.transpose(0, 3, 1, 2),
                              self.block_cost_scale)
        init_cost = Init3D(self.C, self.norm, self.activation,
                           dtype=self.dtype)(raw_cost, train)

        if memory is None:
            mem_sample = jnp.zeros((b, h, w, self.topk), left.dtype)
            mem_volume = jnp.zeros((b, h, w, self.topk), left.dtype)
        else:
            mem_sample, mem_volume = memory.gated()

        past_conv = Conv3d(self.C, (1, 1, 1), 1, 0, use_bias=False,
                           norm=self.norm, activation=self.activation,
                           kernel_init=msra_init(), dtype=self.dtype,
                           name="past_conv")
        disp_sample, init_cost = _fuse_memory(
            init_cost, disp_sample, mem_sample, mem_volume, past_conv,
            self.C, train)

        if self.spatial_fusion:
            init_cost = PyramidFusion(self.C, self.norm, self.activation,
                                      dtype=self.dtype)(init_cost, train)

        cost, off = PredictionHeads(self.C, self.delta, self.norm,
                                    self.activation, dtype=self.dtype)(
            init_cost, train)

        disp, _, _ = topk_soft_argmin(cost, disp_sample, off, self.topk)
        disp_up = ConvexUpsample(2, 3, dtype=self.dtype)(left, disp,
                                                         train=train)
        return disp_up, cost, off, disp_sample


class PreciseAggregation(nn.Module):
    """Image-guided aggregation @1/4 + full-res decoder; emits the next
    frame's cost memory (precise.py:11-105)."""
    in_planes: int
    C: int
    num_sample: int = 5
    delta: float = 1.0
    block_cost_scale: int = 3
    topk: int = 2
    norm: str = "BN3d"
    activation: Any = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray,
                 low: jnp.ndarray, high: jnp.ndarray,
                 left_image: jnp.ndarray, right_image: jnp.ndarray,
                 train: bool = False):
        refinement = UNet(out_planes=self.in_planes, dtype=self.dtype,
                          name="refinement")
        (spx2l, spx4l), (_, spx4r) = refinement.encode(left_image,
                                                       right_image, train)
        left = jnp.concatenate([left, spx4l], axis=-1)
        right = jnp.concatenate([right, spx4r], axis=-1)

        disp_sample = fractional_disparity_samples(low, high)
        raw_cost = block_cost(left, right,
                              disp_sample.transpose(0, 3, 1, 2),
                              self.block_cost_scale)
        init_cost = Init3D(self.C, self.norm, self.activation,
                           dtype=self.dtype)(raw_cost, train)
        cost, off = PredictionHeads(self.C, self.delta, self.norm,
                                    self.activation, dtype=self.dtype)(
            init_cost, train)

        disp, mem_sample, mem_volume = topk_soft_argmin(
            cost, disp_sample, off, self.topk)
        full_disp = refinement.decode(disp, left, spx2l, train)

        h, w = disp.shape[1:3]
        new_memory = CostMemory(
            disp_sample=resize_bilinear(mem_sample / 2, (h // 2, w // 2)),
            cost_volume=resize_bilinear(mem_volume, (h // 2, w // 2)),
            valid=jnp.ones((), jnp.bool_),
        )
        return full_disp, disp, cost, off, disp_sample, new_memory


@AGGREGATION_REGISTRY.register(name="TEMPORALSTEREO")
class TemporalStereoAggregation(nn.Module):
    """The cascade driver (aggregation/TemporalStereo/TemporalStereo.py:97-135):
    coarse @1/16 -> fine @1/8 -> precise @1/4, search range disp +/- 4 between
    stages, outputs index-0 = finest (list reversal :135)."""
    coarse_cfg: Dict[str, Any]
    fine_cfg: Dict[str, Any]
    precise_cfg: Dict[str, Any]
    dtype: Any = None

    disp_range: float = 4.0

    @nn.compact
    def __call__(self, left_feats, right_feats, left_image, right_image,
                 cost_memory: Optional[CostMemory] = None,
                 local_map: Optional[jnp.ndarray] = None,
                 train: bool = False):
        l4, l8, l16 = left_feats
        r4, r8, r16 = right_feats

        disps, costs, offs, samples, search_ranges = [], [], [], [], []

        disp, cost, off, sample = CoarseAggregation(
            **self.coarse_cfg, dtype=self.dtype, name="coarse")(
            l16, r16, cost_memory, train)
        low, high = disp - self.disp_range, disp + self.disp_range
        disps.append(disp)
        costs.append(cost)
        offs.append(off)
        samples.append(sample)
        search_ranges.append({"low": low, "high": high})

        disp, cost, off, sample = FineAggregation(
            **self.fine_cfg, dtype=self.dtype, name="fine")(
            l8, r8, low, high, cost_memory, local_map, train)
        low, high = disp - self.disp_range, disp + self.disp_range
        disps.append(disp)
        costs.append(cost)
        offs.append(off)
        samples.append(sample)
        search_ranges.append({"low": low, "high": high})

        full_disp, disp, cost, off, sample, new_memory = PreciseAggregation(
            **self.precise_cfg, dtype=self.dtype, name="precise")(
            l4, r4, low, high, left_image, right_image, train)
        disps.extend([disp, full_disp])
        costs.append(cost)
        offs.append(off)
        samples.append(sample)

        return (disps[::-1], costs[::-1], samples[::-1], offs[::-1],
                search_ranges[::-1], new_memory, full_disp)
