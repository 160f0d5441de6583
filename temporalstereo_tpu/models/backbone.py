"""TemporalStereo backbone: EfficientNetV2-S trunk + FPN decoder with
temporal channel-memory splicing.

TPU-native re-design of reference
``architecture/modeling/backbone/TemporalStereo.py``:
  * timm ``efficientnetv2_rw_s`` split into 5 block groups (:60-72) —
    re-implemented natively in flax (no timm): stem(24) ->
    er2/e1/c24 -> er4/e4/c48(/4) -> er4/e4/c64(/8) ->
    [ir6/e4/c128(/16) + ir9/e6/c160] -> ir15/e6/c272(/32),
    channels [24, 48, 64, 160, 272] exactly as consumed by the reference
    decoder (:74-90).
  * FPN top-down decoder to out_channels [64, 128, 256, 320] (:78-90).
  * the temporal backbone memory: in every residual InvertedResidual the
    first ``mc = in_ch * memory_percent`` channels of the input are replaced
    by the previous frame's saved slice; the current slice becomes the new
    memory (:165-218).  Here the splice is a first-class module feature, not
    a monkey-patch, and is driven by a ``has_memory`` flag so the temporal
    scan keeps static shapes (frame 0 splices the input's own slice, which
    reproduces the reference's ``memory = input1`` no-op, :191-195).
  * left+right batched through the trunk in one pass (:150) — which both
    shares BatchNorm statistics across views and doubles the effective batch
    fed to the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Conv2d
from ..ops.interpolate import resize_bilinear
from ..utils.registry import BACKBONE_REGISTRY


@dataclasses.dataclass(frozen=True)
class StageSpec:
    block_type: str      # 'er' (edge residual) | 'ir' (inverted residual)
    repeats: int
    stride: int
    expand: int
    channels: int
    se_ratio: float = 0.0


# efficientnetv2_rw_s trunk (timm arch-def equivalent), grouped per the
# reference's split indices [1, 2, 3, 5, 7] (backbone/TemporalStereo.py:66).
V2S_GROUPS: Tuple[Tuple[StageSpec, ...], ...] = (
    (StageSpec("er", 2, 1, 1, 24),),
    (StageSpec("er", 4, 2, 4, 48),),
    (StageSpec("er", 4, 2, 4, 64),),
    (StageSpec("ir", 6, 2, 4, 128, 0.25), StageSpec("ir", 9, 1, 6, 160, 0.25)),
    (StageSpec("ir", 15, 2, 6, 272, 0.25),),
)
STEM_CHANNELS = 24

# miniature trunk with identical topology (one block per stage) — used by
# tests and dry-runs where compile time matters more than capacity
TINY_GROUPS: Tuple[Tuple[StageSpec, ...], ...] = (
    (StageSpec("er", 1, 1, 1, 24),),
    (StageSpec("er", 1, 2, 2, 32),),
    (StageSpec("er", 1, 2, 2, 40),),
    (StageSpec("ir", 2, 2, 2, 48, 0.25), StageSpec("ir", 2, 1, 2, 56, 0.25)),
    (StageSpec("ir", 2, 2, 2, 64, 0.25),),
)


class SqueezeExcite(nn.Module):
    rd_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), dtype=self.dtype,
                    name="reduce")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)


class EdgeResidual(nn.Module):
    """Fused-MBConv: 3x3 expand conv + 1x1 project (EfficientNetV2 'er')."""
    channels: int
    stride: int = 1
    expand: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        has_residual = self.stride == 1 and in_ch == self.channels
        y = Conv2d(mid, 3, self.stride, 1, use_bias=False, norm="BN",
                   activation="SiLU", dtype=self.dtype, name="conv_exp")(
            x, train)
        y = Conv2d(self.channels, 1, 1, 0, use_bias=False, norm="BN",
                   dtype=self.dtype, name="conv_pwl")(y, train)
        return x + y if has_residual else y


class InvertedResidual(nn.Module):
    """MBConv with SE and optional temporal channel memory.

    When ``has_residual`` and ``memory_percent > 0`` the call takes/returns a
    memory slice (reference _inverted_residual_forward, :183-218).
    """
    channels: int
    stride: int = 1
    expand: int = 4
    se_ratio: float = 0.25
    memory_percent: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 memory: Optional[jnp.ndarray] = None,
                 has_memory: Optional[jnp.ndarray] = None,
                 train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        has_residual = self.stride == 1 and in_ch == self.channels
        mc = int(in_ch * self.memory_percent) if has_residual else 0

        new_memory = None
        h = x
        if mc > 0:
            input1 = x[..., :mc]
            new_memory = input1
            if memory is None:
                mem = input1
            elif has_memory is not None:
                mem = jnp.where(has_memory, memory, input1)
            else:
                mem = memory
            h = jnp.concatenate([mem, x[..., mc:]], axis=-1)

        h = Conv2d(mid, 1, 1, 0, use_bias=False, norm="BN",
                   activation="SiLU", dtype=self.dtype, name="conv_pw")(
            h, train)
        h = Conv2dDW(mid, 3, self.stride, dtype=self.dtype,
                     name="conv_dw")(h, train)
        if self.se_ratio > 0:
            rd = max(1, int(in_ch * self.se_ratio))
            h = SqueezeExcite(rd, dtype=self.dtype, name="se")(h)
        h = Conv2d(self.channels, 1, 1, 0, use_bias=False, norm="BN",
                   dtype=self.dtype, name="conv_pwl")(h, train)

        out = x + h if has_residual else h
        return out, new_memory


class Conv2dDW(nn.Module):
    """Depthwise 3x3 conv + BN + SiLU."""
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.kernel_size // 2
        y = nn.Conv(self.channels, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), feature_group_count=x.shape[-1],
                    use_bias=False, dtype=self.dtype)(x)
        from ..nn.layers import _BNShift

        if not train and self.has_variable("folded_bn", "marker"):
            # BN folded into the conv kernel (utils/fold_bn wrote this
            # module's 'folded_bn' marker) — only the shift remains
            y = _BNShift(name="BatchNorm_0", dtype=self.dtype)(y)
        else:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(y)
        return jax.nn.silu(y)


@BACKBONE_REGISTRY.register(name="TEMPORALSTEREO")
class TemporalStereoBackbone(nn.Module):
    """Backbone: shared-weight stereo feature pyramids with temporal memory.

    forward(l_img, r_img, memories, has_memory, train) ->
      (l_fms [x4, x8, x16], r_fms [x4, x8, x16], new_memories)

    Output channels (out_channels [64, 128, 256], reference :74-90).
    ``memories`` is a tuple of [B, h, w, mc] arrays (one per residual IR
    block, 27 for the default config) or None for single-frame mode.
    """
    memory_percent: float = 0.0
    groups: Tuple[Tuple[StageSpec, ...], ...] = V2S_GROUPS
    out_channels: Tuple[int, ...] = (0, 64, 128, 256, 320)
    norm: str = "BN"
    activation: str = "SiLU"
    dtype: Any = None

    def _trunk(self, x, memories, has_memory, train):
        mem_in = list(memories) if memories is not None else None
        mem_idx = 0
        new_memories: List[jnp.ndarray] = []
        features = []
        x = Conv2d(STEM_CHANNELS, 3, 2, 1, use_bias=False, norm="BN",
                   activation="SiLU", dtype=self.dtype, name="conv_stem")(
            x, train)
        for gi, group in enumerate(self.groups):
            for si, spec in enumerate(group):
                for r in range(spec.repeats):
                    stride = spec.stride if r == 0 else 1
                    name = f"g{gi}_s{si}_b{r}"
                    if spec.block_type == "er":
                        x = EdgeResidual(spec.channels, stride, spec.expand,
                                         dtype=self.dtype, name=name)(x, train)
                    else:
                        in_ch = x.shape[-1]
                        residual = stride == 1 and in_ch == spec.channels
                        mem = None
                        if (residual and self.memory_percent > 0
                                and mem_in is not None):
                            mem = mem_in[mem_idx]
                        x, new_mem = InvertedResidual(
                            spec.channels, stride, spec.expand, spec.se_ratio,
                            self.memory_percent if residual else 0.0,
                            dtype=self.dtype, name=name)(
                            x, mem, has_memory, train)
                        if new_mem is not None:
                            new_memories.append(new_mem)
                            if mem_in is not None:
                                mem_idx += 1
            features.append(x)
        return features, new_memories

    @nn.compact
    def __call__(self, l_img: jnp.ndarray, r_img: jnp.ndarray,
                 memories: Optional[Sequence[jnp.ndarray]] = None,
                 has_memory: Optional[jnp.ndarray] = None,
                 train: bool = False):
        b = l_img.shape[0]
        lr = jnp.concatenate([l_img, r_img], axis=0)   # batched l/r (:150)
        feats, new_memories = self._trunk(lr, memories, has_memory, train)
        _, x4, x8, x16, x32 = feats
        oc = self.out_channels

        # FPN top-down decoder (:78-90, :125-138)
        x32 = Conv2d(oc[4], 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="conv32")(x32, train)
        up = resize_bilinear(x32, x16.shape[1:3])
        x16 = Conv2d(oc[3], 3, 1, 1, use_bias=False, norm=self.norm,
                     activation=self.activation, dtype=self.dtype,
                     name="deconv32_16_0")(
            jnp.concatenate([up, x16], -1), train)
        x16 = Conv2d(oc[3], 3, 1, 1, use_bias=False, dtype=self.dtype,
                     name="deconv32_16_1")(x16, train)
        up = resize_bilinear(x16, x8.shape[1:3])
        x8 = Conv2d(oc[2], 3, 1, 1, use_bias=False, norm=self.norm,
                    activation=self.activation, dtype=self.dtype,
                    name="deconv16_8_0")(jnp.concatenate([up, x8], -1), train)
        x8 = Conv2d(oc[2], 3, 1, 1, use_bias=False, dtype=self.dtype,
                    name="deconv16_8_1")(x8, train)
        up = resize_bilinear(x8, x4.shape[1:3])
        x4 = Conv2d(oc[1], 3, 1, 1, use_bias=False, norm=self.norm,
                    activation=self.activation, dtype=self.dtype,
                    name="deconv8_4_0")(jnp.concatenate([up, x4], -1), train)
        x4 = Conv2d(oc[1], 3, 1, 1, use_bias=False, dtype=self.dtype,
                    name="deconv8_4_1")(x4, train)

        l_fms = [f[:b] for f in (x4, x8, x16)]
        r_fms = [f[b:] for f in (x4, x8, x16)]
        return l_fms, r_fms, tuple(new_memories)
