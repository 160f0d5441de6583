"""Shared model blocks (flax.linen).

TPU-native re-designs of the reference's shared aggregation blocks
(architecture/modeling/aggregation/TemporalStereo/module.py): ResidualBlock2D
(:9-109), DepthwiseConv3D (:111-147), DepthwiseConvTranspose3D (:149-184),
ResidualBlock3D (:187-297), ConvexUpsample (:300-353), PredictionHeads
(:356-398), PyramidFusion (:401-421), UNet (:424-492), StereoDRNetRefinement
(:496-536) and SPP3D (aggregation/utils/SPP3D.py).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import (
    avg_pool3d,
    max_pool3d,
    resize_bilinear,
    resize_trilinear,
)
from ..ops.upsample import convex_upsample as convex_upsample_op
from ..ops.upsample import mask_upsample_9
from ..ops.warp import inverse_warp
from .layers import (
    Activation,
    Conv2d,
    Conv3d,
    ConvTranspose2d,
    ConvTranspose3d,
    get_activation,
    msra_init,
)


class ResidualBlock2D(nn.Module):
    """2D hourglass residual block (module.py:9-109)."""
    in_planes: int
    norm: str = "BN"
    activation: Activation = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.in_planes
        args = dict(norm=self.norm, activation=self.activation,
                    kernel_init=msra_init(), dtype=self.dtype)
        out = Conv2d(c * 2, 3, 2, 1, use_bias=False, **args)(x, train)
        pre = Conv2d(c * 2, 3, 1, 1, use_bias=False, **args)(out, train)
        out = Conv2d(c * 2, 3, 2, 1, use_bias=False, **args)(pre, train)
        out = Conv2d(c * 2, 3, 1, 1, use_bias=False, **args)(out, train)

        noact = dict(norm=self.norm, activation=None,
                     kernel_init=msra_init(), dtype=self.dtype)
        out = ConvTranspose2d(c * 2, 3, 2, 1, 1, use_bias=False,
                              **noact)(out, train)
        out = resize_bilinear(out, pre.shape[1:3])
        out = jax.nn.silu(out + Conv2d(c * 2, 1, 1, 0, use_bias=False,
                                       **noact)(pre, train))

        out = ConvTranspose2d(c, 3, 2, 1, 1, use_bias=False,
                              **noact)(out, train)
        out = resize_bilinear(out, x.shape[1:3])
        out = jax.nn.silu(out + Conv2d(c, 1, 1, 0, use_bias=False,
                                       **noact)(x, train))
        return out


class DepthwiseConv3D(nn.Module):
    """Factorized (1,k,k)+(k,1,1) 3D conv (module.py:111-147)."""
    out_planes: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    norm: str = "BN3d"
    activation: Activation = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, s, p, d = self.kernel_size, self.stride, self.padding, self.dilation
        args = dict(use_bias=self.use_bias, norm=self.norm,
                    activation=self.activation, kernel_init=msra_init(),
                    dtype=self.dtype)
        x = Conv3d(self.out_planes, (1, k, k), (1, s, s), (0, p, p),
                   (1, d, d), **args)(x, train)
        x = Conv3d(self.out_planes, (k, 1, 1), (s, 1, 1), (p, 0, 0),
                   (d, 1, 1), **args)(x, train)
        return x


class DepthwiseConvTranspose3D(nn.Module):
    """Factorized transposed 3D conv (module.py:149-184)."""
    out_planes: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    norm: str = "BN3d"
    activation: Activation = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k, s, p, op = (self.kernel_size, self.stride, self.padding,
                       self.output_padding)
        args = dict(use_bias=self.use_bias, norm=self.norm,
                    activation=self.activation, kernel_init=msra_init(),
                    dtype=self.dtype)
        x = ConvTranspose3d(self.out_planes, (1, k, k), (1, s, s), (0, p, p),
                            (0, op, op), **args)(x, train)
        x = ConvTranspose3d(self.out_planes, (k, 1, 1), (s, 1, 1), (p, 0, 0),
                            (op, 0, 0), **args)(x, train)
        return x


class ResidualBlock3D(nn.Module):
    """3D hourglass with trilinear-resize skips (module.py:187-297)."""
    in_planes: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    norm: str = "BN3d"
    activation: Activation = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.in_planes
        k, s, p = self.kernel_size, self.stride, self.padding
        act = dict(norm=self.norm, activation=self.activation,
                   dtype=self.dtype)
        noact = dict(norm=self.norm, activation=None, dtype=self.dtype)

        out = DepthwiseConv3D(c * 2, k, s, p, **act)(x, train)
        pre = DepthwiseConv3D(c * 2, k, 1, p, **act)(out, train)

        out = DepthwiseConv3D(c * 2, k, s, p, **act)(pre, train)
        out = DepthwiseConv3D(c * 2, k, 1, p, **noact)(out, train)
        out = jax.nn.silu(out)

        out = DepthwiseConvTranspose3D(c * 2, k, s, p, p, **noact)(out, train)
        out = resize_trilinear(out, pre.shape[1:4])
        out = jax.nn.silu(
            out + DepthwiseConv3D(c * 2, k, 1, p, **noact)(pre, train))

        out = DepthwiseConvTranspose3D(c, k, s, p, p, **noact)(out, train)
        out = resize_trilinear(out, x.shape[1:4])
        out = jax.nn.silu(
            out + DepthwiseConv3D(c, k, 1, p, **noact)(x, train))
        return out


class ConvexUpsample(nn.Module):
    """Learned convex upsample (module.py:300-353): a small conv head emits
    per-subpixel 3x3 window masks; the combine runs in ops.convex_upsample."""
    upscale_factor: int = 2
    window_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray, disp: jnp.ndarray,
                 disp_scale: Optional[float] = None,
                 train: bool = False) -> jnp.ndarray:
        up, win = self.upscale_factor, self.window_size
        m = Conv2d(64, 3, 1, 1, use_bias=True, norm="BN", activation="SiLU",
                   dtype=self.dtype)(feat, train)
        m = Conv2d(win * win * up * up, 1, 1, 0, use_bias=True,
                   dtype=self.dtype)(m, train)
        return convex_upsample_op(disp, m, up, win, disp_scale)


class PredictionHeads(nn.Module):
    """Cost + offset heads over the aggregated volume (module.py:356-398).

    Input [B, D, H, W, C] -> (cost [B, H, W, D], offset [B, H, W, D]); the
    offset is squashed ``tanh(x / 100) * delta`` (:380-386).
    """
    in_planes: int
    delta: float = 1.0
    norm: str = "BN3d"
    activation: Activation = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, init_cost: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.in_planes
        def head(name):
            x = Conv3d(c, (3, 1, 1), 1, (1, 0, 0), use_bias=False,
                       norm=self.norm, activation=self.activation,
                       kernel_init=msra_init(), dtype=self.dtype,
                       name=f"{name}_0")(init_cost, train)
            x = Conv3d(1, (1, 3, 3), 1, (0, 1, 1), use_bias=False,
                       kernel_init=msra_init(), dtype=self.dtype,
                       name=f"{name}_1")(x, train)
            # [B, D, H, W, 1] -> sample-last [B, H, W, D]
            return x[..., 0].transpose(0, 2, 3, 1)

        off = head("off_head")
        off = jnp.clip(jnp.tanh(off / 100.0), -1.0, 1.0) * self.delta
        cost = head("cost_head")
        return cost, off


class PyramidFusion(nn.Module):
    """Disparity-axis context fusion (module.py:401-421): concat of the
    volume, a (5,1,1) conv, and 5x5x5 avg/max pools, fused back to C."""
    in_planes: int
    norm: str = "BN3d"
    activation: Activation = "SiLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, cost: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.in_planes
        conv5 = Conv3d(c, (5, 1, 1), 1, (2, 0, 0), use_bias=False,
                       norm="BN3d", activation=self.activation,
                       kernel_init=msra_init(), dtype=self.dtype)(cost, train)
        cat = jnp.concatenate([
            cost,
            conv5,
            avg_pool3d(cost, (5, 5, 5), (1, 1, 1), (2, 2, 2)),
            max_pool3d(cost, (5, 5, 5), (1, 1, 1), (2, 2, 2)),
        ], axis=-1)
        return DepthwiseConv3D(c, 3, 1, 1, use_bias=False, norm=self.norm,
                               activation=None, dtype=self.dtype)(cat, train)


class UNet(nn.Module):
    """Image-guided refinement encoder/decoder (module.py:424-492)."""
    out_planes: int = 48
    norm: str = "BN"
    dtype: Any = None

    C: int = 32

    def setup(self):
        act = "ReLU"
        C = self.C
        self.conv2_0 = Conv2d(C, 3, 2, 1, use_bias=False, norm=self.norm,
                              activation=act, dtype=self.dtype)
        self.conv2_1 = Conv2d(C, 3, 1, 1, use_bias=False, norm=self.norm,
                              activation=act, dtype=self.dtype)
        self.conv4_0 = Conv2d(self.out_planes, 3, 2, 1, use_bias=False,
                              norm=self.norm, activation=act, dtype=self.dtype)
        self.conv4_1 = Conv2d(self.out_planes, 3, 1, 1, use_bias=False,
                              norm=self.norm, activation=act, dtype=self.dtype)
        self.fuse_0 = Conv2d(C, 3, 1, 1, use_bias=False, norm=self.norm,
                             activation=act, dtype=self.dtype)
        self.fuse_1 = Conv2d(C, 3, 1, 1, use_bias=False, norm=self.norm,
                             activation=act, dtype=self.dtype)
        self.deconv4 = ConvTranspose2d(C, 4, 2, 1, 0, norm=self.norm,
                                       activation=act, dtype=self.dtype)
        self.concat = Conv2d(C, 3, 1, 1, use_bias=False, norm=self.norm,
                             activation=act, dtype=self.dtype)
        self.deconv2 = ConvTranspose2d(9, 4, 2, 1, 0, dtype=self.dtype)

    def encode_one(self, im, train=False):
        spx2 = self.conv2_1(self.conv2_0(im, train), train)
        spx4 = self.conv4_1(self.conv4_0(spx2, train), train)
        return spx2, spx4

    def encode(self, im_left, im_right, train=False):
        """Reference UNet.encoder (module.py:459-466)."""
        return self.encode_one(im_left, train), self.encode_one(im_right, train)

    def decode(self, disp, feat, feat2x, train=False):
        """Reference UNet.decoder (module.py:485-492): fuse features, emit a
        9-way mask at full resolution, convex-upsample the disparity."""
        f = self.fuse_1(self.fuse_0(feat, train), train)
        f = self.deconv4(f, train)
        f = self.concat(jnp.concatenate([f, feat2x], axis=-1), train)
        mask = self.deconv2(f, train)
        return mask_upsample_9(disp, mask)


class BasicBlock(nn.Module):
    """Dilated residual block (module.py:518-536)."""
    out_planes: int
    stride: int = 1
    dilation: int = 1
    norm: str = "BN"
    activation: Activation = "ReLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.dilation if self.dilation > 1 else 1
        out = Conv2d(self.out_planes, 3, self.stride, pad, self.dilation,
                     use_bias=False, norm=self.norm,
                     activation=self.activation, dtype=self.dtype)(x, train)
        out = Conv2d(self.out_planes, 3, 1, pad, self.dilation,
                     use_bias=False, norm=self.norm, activation=None,
                     dtype=self.dtype)(out, train)
        return out + x


class StereoDRNetRefinement(nn.Module):
    """Warp-error refinement head (module.py:496-515; alternative path,
    unused in the reference main model but part of the API surface)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, disp: jnp.ndarray, left_image: jnp.ndarray,
                 right_image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = 16
        warp_left = inverse_warp(right_image, -disp, mode="disparity")
        error = jnp.abs(warp_left - left_image)
        feat = Conv2d(C, 3, 1, 1, use_bias=False, norm="BN",
                      activation="ReLU", dtype=self.dtype)(
            jnp.concatenate([left_image, right_image, warp_left, error], -1),
            train)
        dfeat = Conv2d(C, 3, 1, 1, use_bias=False, norm="BN",
                       activation="ReLU", dtype=self.dtype)(disp, train)
        x = jnp.concatenate([feat, dfeat], axis=-1)
        for dil in (1, 2, 4, 8, 1, 1):
            x = BasicBlock(C * 2, dilation=dil, dtype=self.dtype)(x, train)
        res = Conv2d(1, 3, 1, 1, use_bias=True, dtype=self.dtype)(x, train)
        return jax.nn.relu(disp + res)


class SPP3D(nn.Module):
    """3D spatial pyramid pooling over a cost volume (SPP3D.py:8-49),
    reference-exact: per-stride (D,H,W) avg-pooling clamped to the volume
    extent (floor semantics — the non-divisible tail is discarded, torch
    avg_pool3d ceil_mode=False), 16-channel 1x1x1 branch convs, trilinear
    align-corners upsample, concat with the input, then a full 3x3x3 fuse
    conv + a plain 1x1x1 projection."""
    in_planes: int
    strides: Tuple[int, ...] = (2, 4, 8, 16)
    norm: str = "BN3d"
    activation: Activation = "ReLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, cost: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, d, h, w, c = cost.shape
        branches = [cost]
        for i, stride in enumerate(self.strides):
            kd, kh, kw = min(d, stride), min(h, stride), min(w, stride)
            x = cost[:, :d // kd * kd, :h // kh * kh, :w // kw * kw, :]
            pooled = avg_pool3d(x, (kd, kh, kw))
            conv = Conv3d(16, (1, 1, 1), 1, 0, use_bias=False,
                          norm=self.norm, activation=self.activation,
                          dtype=self.dtype, name=f"pool_conv_{i}")(
                pooled, train)
            branches.append(resize_trilinear(conv, (d, h, w)))
        fused = jnp.concatenate(branches, axis=-1)
        fused = Conv3d(self.in_planes, (3, 3, 3), 1, 1, use_bias=False,
                       norm=self.norm, activation=self.activation,
                       dtype=self.dtype, name="fuse_0")(fused, train)
        return Conv3d(self.in_planes, (1, 1, 1), 1, 0, use_bias=False,
                      dtype=self.dtype, name="fuse_1")(fused, train)
