"""Cost-volume construction ops (NDHWC).

TPU-native re-design of the reference cost constructors
``architecture/modeling/aggregation/utils/block_cost.py`` (block_cost :16-83,
groupwise_correlation :6-13), ``cat_fms.py`` (:5-36) and ``dif_fms.py``
(:5-44).

Layouts: features [B, H, W, C]; disparity samples [B, D, H, W]; cost volumes
[B, D, H, W, C'] so the channel dim stays in TPU lanes for the 3D-conv stacks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .interpolate import avg_pool3d, resize_trilinear
from .warp import shift_1d

CHANNELS_PER_GROUP = 8

# Single pallas switch: cfg.TPU.USE_PALLAS, consumed by models.build_model
# via configure_pallas().  Default OFF — a measured decision, not a hedge:
#
# Roofline argument (v5e, bf16, 384x1248, profiler + compiled cost analysis):
#   * The whole temporal step runs at 0.7% MFU and ~11% of HBM peak — the
#     network is hundreds of small ops over small spatial extents, i.e.
#     LATENCY/occupancy-bound, not FLOP- or bandwidth-bound.  ~46% of summed
#     device time is async copy/slice DMA that XLA overlaps with compute.
#   * The region the fused cost kernel covers (warp + concat + scale-0
#     correlation, all three stages) is ~1.2 ms of a 17 ms frame (~7%).
#     Even a zero-cost kernel caps the end-to-end gain at ~7%; the kernel
#     still has to stream the same volume, so the realistic ceiling is ~3%.
#   * `pallas_call` is a fusion barrier: XLA can no longer fold the one-hot
#     warp matrices, concat and correlation into neighboring consumers, nor
#     overlap their DMA with adjacent fusions.  Measured end-to-end cost of
#     the barrier exceeds the in-kernel win: 45.5 vs 49.2 fps temporal,
#     51.9 vs 56.9 fps single-frame (kernels ON vs OFF, r2 bench).
#   * Standalone, the kernels DO win (2.3x @1/4: 0.39 vs 0.91 ms, C=128 D=5;
#     1.9x @1/8: 0.25 vs 0.47 ms) — kept, parity-tested, and config-gated
#     for workloads where the cost volume dominates (bigger C/D, fused
#     pipelines that already materialize at the kernel boundary).
_PALLAS_ENABLED = False


def configure_pallas(enabled: bool) -> None:
    """Consume cfg.TPU.USE_PALLAS (called by models.build_model)."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)


def _use_pallas() -> bool:
    """Pallas W-shift kernel toggle (ops/pallas/shift.py)."""
    return _PALLAS_ENABLED


def _use_pallas_cost() -> bool:
    """Fused cost-volume kernel toggle (ops/pallas/cost.py) — see the
    roofline note above for why the default is the XLA lowering."""
    return _PALLAS_ENABLED


def _shift(img, disp, padding_mode="zeros"):
    if _use_pallas():
        from .pallas.shift import shift_1d_pallas

        return shift_1d_pallas(img, disp)
    if jax.default_backend() == "tpu":
        from .warp import shift_1d_matmul

        return shift_1d_matmul(img, disp)
    return shift_1d(img, disp, padding_mode=padding_mode)


def groupwise_correlation(fea1: jnp.ndarray, fea2: jnp.ndarray) -> jnp.ndarray:
    """Negative squared distance summed within channel groups of 8.

    Reference: groupwise_correlation (block_cost.py:6-13).
    [B, D, H, W, C] -> [B, D, H, W, C//8].
    """
    b, d, h, w, c = fea1.shape
    assert c % CHANNELS_PER_GROUP == 0, f"channels {c} not divisible by 8"
    g = c // CHANNELS_PER_GROUP
    diff = fea1 - fea2
    cost = -(diff * diff).reshape(b, d, h, w, g, CHANNELS_PER_GROUP).sum(-1)
    return cost


def shift_right_features(target_fm: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """Stack right features shifted by each integer disparity.

    out[:, d, :, x, :] = target[:, :, x-d, :] (zero beyond the left edge) —
    the unfold+flip construction of block_cost's int path
    (block_cost.py:36-41), built with static pads instead of unfold.
    [B, H, W, C] -> [B, D, H, W, C].
    """
    b, h, w, c = target_fm.shape
    shifted = []
    for d in range(max_disp):
        if d == 0:
            shifted.append(target_fm)
        else:
            pad = jnp.pad(target_fm, ((0, 0), (0, 0), (d, 0), (0, 0)))
            shifted.append(pad[:, :, :w, :])
    return jnp.stack(shifted, axis=1)


def block_cost(reference_fm: jnp.ndarray, target_fm: jnp.ndarray,
               disp_sample, block_cost_scale: int = 3) -> jnp.ndarray:
    """THE cost-volume constructor (reference block_cost, block_cost.py:16-83).

    Two modes on ``disp_sample``:
      * int D: dense integer disparities 0..D-1, difference cost
        ``-(l - r_shifted)^2`` -> base cost has C channels.
      * tensor [B, D, H, W]: sparse per-pixel hypotheses, right features
        warped by ``-disp`` along W, base cost = concat([ref, warped]) ->
        2C channels.
    Both are augmented with a multi-scale groupwise correlation pyramid
    (scales 2^s, s < block_cost_scale) pooled over (H, W), correlated, and
    trilinearly upsampled back (block_cost.py:64-81).

    Returns [B, D, H, W, C_base + block_cost_scale * C // 8].
    """
    b, h, w, c = reference_fm.shape

    if isinstance(disp_sample, int):
        d = disp_sample
        tgt = shift_right_features(target_fm, d)                  # [B,D,H,W,C]
        ref = jnp.broadcast_to(reference_fm[:, None], (b, d, h, w, c))
        diff = ref - tgt
        base = -(diff * diff)
    elif (_use_pallas_cost() and c % CHANNELS_PER_GROUP == 0
          and int(block_cost_scale) >= 1):
        # fused kernel: warp + concat + scale-0 corr in one VMEM pass; the
        # pooled scales below read its output slices (1/4, 1/16 the data)
        from .pallas.cost import fused_cost_base_pallas

        d = disp_sample.shape[1]
        fused = fused_cost_base_pallas(reference_fm, target_fm, disp_sample)
        ref, tgt = fused[..., :c], fused[..., c:2 * c]
        costs = [fused]
        for s in range(1, int(block_cost_scale)):
            sh, sw = min(2 ** s, h), min(2 ** s, w)
            local_ref = avg_pool3d(ref, (1, sh, sw))
            local_tgt = avg_pool3d(tgt, (1, sh, sw))
            corr = groupwise_correlation(local_ref, local_tgt)
            costs.append(resize_trilinear(corr, (d, h, w)))
        return jnp.concatenate(costs, axis=-1)
    else:
        d = disp_sample.shape[1]
        ref = jnp.broadcast_to(reference_fm[:, None], (b, d, h, w, c))
        tgt = _shift(target_fm[:, None], -disp_sample)
        base = jnp.concatenate([ref, tgt], axis=-1)

    costs = [base]
    for s in range(int(block_cost_scale)):
        sh, sw = min(2 ** s, h), min(2 ** s, w)
        if (sh, sw) == (1, 1):
            local_ref, local_tgt = ref, tgt
        else:
            local_ref = avg_pool3d(ref, (1, sh, sw))
            local_tgt = avg_pool3d(tgt, (1, sh, sw))
        corr = groupwise_correlation(local_ref, local_tgt)
        if (sh, sw) != (1, 1):
            corr = resize_trilinear(corr, (d, h, w))
        costs.append(corr)

    return jnp.concatenate(costs, axis=-1)


def cat_fms(reference_fm: jnp.ndarray, target_fm: jnp.ndarray,
            disp_sample) -> jnp.ndarray:
    """Concatenation cost volume over disparity hypotheses.

    Reference: cat_fms (cat_fms.py:5-36).
    [B,H,W,C] x2 + ([B,D,H,W] tensor | int D) -> [B, D, H, W, 2C].

    TPU note: an int ``disp_sample`` means dense integer disparities 0..D-1
    and takes the static-shift path (pure slicing, bandwidth-bound); the
    per-pixel tensor path needs a data-dependent gather (~100x slower on TPU
    for dense ranges — prefer the int form when hypotheses are integers).
    """
    b, h, w, c = reference_fm.shape
    if isinstance(disp_sample, int):
        d = disp_sample
        tgt = shift_right_features(target_fm, d)
    else:
        d = disp_sample.shape[1]
        tgt = shift_1d(target_fm[:, None], -disp_sample, padding_mode="zeros")
    ref = jnp.broadcast_to(reference_fm[:, None], (b, d, h, w, c))
    return jnp.concatenate([ref, tgt], axis=-1)


def dif_fms(reference_fm: jnp.ndarray, target_fm: jnp.ndarray,
            disp_sample) -> jnp.ndarray:
    """Absolute-difference cost volume with max-cost fill.

    Reference: dif_fms (dif_fms.py:5-44).  The fill rule (:36-41) is
    per-ELEMENT on the warped feature value — any position whose warped
    target feature is <= 0 takes the volume-wide max cost (zero-padding
    makes out-of-view positions a subset of that, but genuinely non-positive
    feature values are filled too; matched exactly here).
    ([B,D,H,W] tensor | int D) -> [B, D, H, W, C]; int takes the static-shift
    fast path (see cat_fms).
    """
    b, h, w, c = reference_fm.shape
    if isinstance(disp_sample, int):
        d = disp_sample
        tgt = shift_right_features(target_fm, d)
    else:
        d = disp_sample.shape[1]
        tgt = shift_1d(target_fm[:, None], -disp_sample, padding_mode="zeros")
    ref = jnp.broadcast_to(reference_fm[:, None], (b, d, h, w, c))
    cost = jnp.abs(ref - tgt)

    max_cost = jnp.max(cost)
    return jnp.where(tgt > 0, cost, max_cost)
