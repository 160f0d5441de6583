"""Pallas TPU kernel: fused sparse cost-volume base construction.

Fuses the tensor-path core of ``ops.cost.block_cost`` (reference
block_cost.py:47-66) into one VMEM pass per row tile:

  1. bilinear warp of the right features to each disparity hypothesis —
     built as a per-row one-hot interpolation matrix contracted on the MXU
     (no gather, no HBM index traffic; same math as ops.warp.shift_1d_matmul)
  2. the [ref, warped] channel concat (the 2C-channel base volume)
  3. the scale-0 groupwise correlation (C//8 extra channels)

all written to a single [B, D, H, W, 2C + C//8] output — the XLA lowering
materializes the warped volume, the concat, and the correlation as separate
HBM round-trips.  The pooled pyramid scales (s >= 1 of block_cost.py:64-81)
stay in XLA: they read the kernel's own output slices at 1/4 and 1/16 of the
data volume.

The right features are read once per (b, row-tile) and stay resident in VMEM
across the D innermost grid steps (no [B,D,H,W,C] broadcast in HBM).

Autodiff: custom_vjp whose backward differentiates the identical XLA
formulation, so training gradients match the reference semantics exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # channels per correlation group (block_cost.py:6-13)


def _kernel(disp_ref, ref_ref, tgt_ref, out_ref):
    # disp_ref [1, 1, R, W]; ref_ref/tgt_ref [1, R, W, C];
    # out_ref [1, 1, R, W, 2C + C//8]
    _, r, w, c = ref_ref.shape
    g = c // GROUP
    col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)     # [w_out, w_in]
    # int iota then cast — Mosaic rejects float tpu.iota
    xi = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0].astype(
        jnp.float32)
    # group-sum as a [C, C//8] 0/1 selection matmul: Mosaic cannot split the
    # 128-lane dim in a reshape ((W,C)->(W,G,8) is "unsupported shape cast")
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    sel = (ch // GROUP == gr).astype(jnp.float32)            # [C, G]
    for i in range(r):
        ref_row = ref_ref[0, i]                              # [W, C]
        tgt_row = tgt_ref[0, i]                              # [W, C]
        shift = -disp_ref[0, 0, i, :].astype(jnp.float32)    # [W]
        xs = xi + shift
        x0 = jnp.floor(xs)
        fx = xs - x0
        x0i = x0.astype(jnp.int32)
        # 2-tap one-hot bilinear matrix; out-of-range taps never match `col`
        m = (jnp.where(col == x0i[:, None], (1.0 - fx)[:, None], 0.0)
             + jnp.where(col == x0i[:, None] + 1, fx[:, None], 0.0))
        warped = jnp.dot(m.astype(tgt_row.dtype), tgt_row,
                         preferred_element_type=jnp.float32)
        warped = warped.astype(ref_row.dtype)
        out_ref[0, 0, i, :, :c] = ref_row
        out_ref[0, 0, i, :, c:2 * c] = warped
        diff = (ref_row - warped).astype(jnp.float32)
        corr = jnp.dot(-(diff * diff), sel,
                       preferred_element_type=jnp.float32)
        out_ref[0, 0, i, :, 2 * c:] = corr.astype(out_ref.dtype)


def _forward(reference_fm, target_fm, disp_sample):
    b, h, w, c = reference_fm.shape
    d = disp_sample.shape[1]
    assert disp_sample.shape == (b, d, h, w), disp_sample.shape
    assert c % GROUP == 0, f"channels {c} not divisible by {GROUP}"
    co = 2 * c + c // GROUP

    rows = 8
    while h % rows != 0 and rows > 1:
        rows //= 2

    # d innermost: the ref/tgt row tiles keep the same block index across
    # the D steps, so Mosaic skips re-fetching them
    out = pl.pallas_call(
        _kernel,
        grid=(b, h // rows, d),
        in_specs=[
            pl.BlockSpec((1, 1, rows, w), lambda bi, hi, di: (bi, di, hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w, c), lambda bi, hi, di: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, w, co),
                               lambda bi, hi, di: (bi, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, co), reference_fm.dtype),
    )(disp_sample, reference_fm, target_fm)
    return out


def _xla_reference(reference_fm, target_fm, disp_sample):
    """The identical XLA formulation (for the backward pass and parity)."""
    from ..cost import groupwise_correlation
    from ..warp import shift_1d

    b, h, w, c = reference_fm.shape
    d = disp_sample.shape[1]
    ref = jnp.broadcast_to(reference_fm[:, None], (b, d, h, w, c))
    tgt = shift_1d(target_fm[:, None], -disp_sample, padding_mode="zeros")
    return jnp.concatenate(
        [ref, tgt, groupwise_correlation(ref, tgt)], axis=-1)


@jax.custom_vjp
def fused_cost_base_pallas(reference_fm: jnp.ndarray, target_fm: jnp.ndarray,
                           disp_sample: jnp.ndarray) -> jnp.ndarray:
    """ref/tgt [B,H,W,C] + hypotheses [B,D,H,W] ->
    [B, D, H, W, 2C + C//8] = concat([ref, warped_tgt, groupwise_corr])."""
    return _forward(reference_fm, target_fm, disp_sample)


def _fwd(reference_fm, target_fm, disp_sample):
    return (_forward(reference_fm, target_fm, disp_sample),
            (reference_fm, target_fm, disp_sample))


def _bwd(res, gout):
    reference_fm, target_fm, disp_sample = res
    _, vjp = jax.vjp(_xla_reference, reference_fm, target_fm, disp_sample)
    return vjp(gout)


fused_cost_base_pallas.defvjp(_fwd, _bwd)
