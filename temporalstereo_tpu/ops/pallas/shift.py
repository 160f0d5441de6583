"""Pallas TPU kernel: per-row bilinear gather along W (cost-volume warp).

This is the hot inner op of sparse cost-volume construction
(reference inverse_warp_3d.py:4-57 / block_cost.py:56): every disparity
hypothesis samples the right-view features at ``x + shift`` with bilinear
interpolation and zero padding.  The XLA lowering is a row gather
(~2.5 ms/frame at KITTI 1/4 resolution); this kernel instead builds the
2-tap one-hot interpolation matrix **in VMEM** per row and contracts it on
the MXU — no gather, no HBM index traffic.

out[n, x, c] = (1-f) * img[n, x0, c] + f * img[n, x0+1, c]
  where x0 = floor(x + shift[n, x]), f = frac, out-of-range taps -> 0.

Autodiff: wrapped in custom_vjp; the backward pass differentiates the
mathematically identical XLA formulation (ops.warp.shift_1d), so training
gradients match the reference semantics exactly while inference takes the
fast path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(shift_ref, img_ref, out_ref):
    r, w, c = img_ref.shape
    col_in = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)   # [w_out, w_in]
    for i in range(r):
        # f32 coordinate math (see ops.warp.shift_1d: bf16 integers > 256
        # step by 2, mis-rounding tap indices at W > 256)
        shift = shift_ref[i, :].astype(jnp.float32)           # [w]
        xi = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0]
        xs = xi.astype(jnp.float32) + shift
        x0 = jnp.floor(xs)
        fx = xs - x0
        x0i = x0.astype(jnp.int32)
        # two-tap one-hot interpolation matrix [w_out, w_in]
        m = (jnp.where(col_in == x0i[:, None], (1.0 - fx)[:, None], 0.0)
             + jnp.where(col_in == x0i[:, None] + 1, fx[:, None], 0.0))
        out_ref[i, :, :] = jnp.dot(
            m.astype(img_ref.dtype), img_ref[i, :, :],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def shift_1d_pallas(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """img: [B, D, H, W, C] (broadcast over D allowed); shift: [B, D, H, W].
    Returns [B, D, H, W, C] — same contract as ops.warp.shift_1d with
    padding_mode='zeros'."""
    return _forward(img, shift)


def _forward(img, shift):
    b, d, h, w = shift.shape
    c = img.shape[-1]
    img = jnp.broadcast_to(img, (b, d, h, w, c))
    n = b * d * h

    rows_per_block = 8
    while n % rows_per_block != 0 and rows_per_block > 1:
        rows_per_block //= 2
    grid = n // rows_per_block

    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows_per_block, w),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, w, c),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, w, c), img.dtype),
    )(shift.reshape(n, w), img.reshape(n, w, c))
    return out.reshape(b, d, h, w, c)


def _fwd(img, shift):
    return _forward(img, shift), (img, shift)


def _bwd(res, g):
    from ..warp import shift_1d

    img, shift = res
    # differentiate the identical XLA formulation
    _, vjp = jax.vjp(lambda i, s: shift_1d(i, s, padding_mode="zeros"),
                     img, shift)
    return vjp(g)


shift_1d_pallas.defvjp(_fwd, _bwd)
