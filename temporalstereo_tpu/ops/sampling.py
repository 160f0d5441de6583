"""Disparity regression / sampling ops.

Sample-last layout: per-pixel hypothesis tensors are [B, H, W, D] (the D axis
sits in TPU lanes, so softmax/top-k/sort are pure VPU work).

Re-designs of:
  * predict_disp top-k soft-argmin (coarse.py:69-75, fine.py:70-76,
    precise.py:61-67)
  * SOFTARGMIN (prediction/soft_argmin.py:38-61), ARGMIN (argmin.py:35-46)
  * the memory-fusion concat+sort+gather (coarse.py:100-105, fine.py:116-121)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _topk_onehot(values: jnp.ndarray, payload: jnp.ndarray, k: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless top-k over the (small) last axis via iterated masked max.

    TPU note: ``lax.top_k`` lowers to a sort (~0.7 ms per call at KITTI
    sizes even for D=5); for the model's D <= 32 hypothesis axes k masked
    max/select passes are pure VPU work.  Ties resolve to the lowest index
    (same as lax.top_k).  Returns (topk_values, topk_payload).
    """
    d = values.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, values.shape, values.ndim - 1)
    cur = values
    vals, pays = [], []
    for _ in range(k):
        m = jnp.max(cur, axis=-1, keepdims=True)
        is_max = cur == m
        # first occurrence of the max (lax.top_k tie-break) via min-index
        # reduce — NOT cumsum, whose reduce-window lowering costs ~2 ms at
        # KITTI 1/8 sizes on TPU
        first_idx = jnp.min(jnp.where(is_max, iota, d), axis=-1,
                            keepdims=True)
        sel = iota == first_idx
        vals.append(m[..., 0])
        pays.append(jnp.sum(payload * sel.astype(payload.dtype), axis=-1))
        cur = jnp.where(sel, -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(pays, axis=-1)


def topk_soft_argmin(cost: jnp.ndarray, disp_sample: jnp.ndarray,
                     offset: jnp.ndarray, k: int = 2
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k soft-argmin with learned offsets.

    cost/disp_sample/offset: [B, H, W, D].
    Returns (disp [B,H,W,1], topk_disp [B,H,W,k], topk_cost [B,H,W,k]).
    Reference: predict_disp (coarse.py:69-75).
    """
    if cost.shape[-1] <= 32:
        topk_cost, topk_disp = _topk_onehot(cost, disp_sample + offset, k)
    else:
        topk_cost, indices = jax.lax.top_k(cost, k)
        topk_disp = jnp.take_along_axis(disp_sample + offset, indices,
                                        axis=-1)
    prob = jax.nn.softmax(topk_cost, axis=-1)
    disp = jnp.sum(prob * topk_disp, axis=-1, keepdims=True)
    return disp, topk_disp, topk_cost


def soft_argmin(cost: jnp.ndarray, disp_sample: jnp.ndarray,
                temperature: float = 1.0, normalize: bool = True
                ) -> jnp.ndarray:
    """Full softmax-weighted expectation over hypotheses.

    Reference: SOFTARGMIN forward (prediction/soft_argmin.py:38-61).
    cost, disp_sample: [B, H, W, D] -> [B, H, W, 1].
    """
    prob = jax.nn.softmax(cost * temperature, axis=-1) if normalize else cost
    return jnp.sum(prob * disp_sample, axis=-1, keepdims=True)


def hard_argmin(cost: jnp.ndarray, disp_sample: jnp.ndarray) -> jnp.ndarray:
    """Hard argmax over hypotheses (reference ARGMIN, argmin.py:35-46)."""
    idx = jnp.argmax(cost, axis=-1, keepdims=True)
    return jnp.take_along_axis(disp_sample, idx, axis=-1)


def sort_samples_with_volume(disp_sample: jnp.ndarray, volume: jnp.ndarray
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort hypotheses by disparity and permute the cost volume to match.

    disp_sample: [B, H, W, D]; volume: [B, D, H, W, C].
    Reference: the post-memory-concat re-sort (coarse.py:103-105).

    TPU note: for the model's small D (<= 32) the sort is computed as
    pairwise *ranks* (D^2 VPU comparisons) and the permutation applied as a
    one-hot einsum — no XLA sort, no gather (both are slow TPU lowerings).
    """
    d = disp_sample.shape[-1]
    if d > 32:
        order = jnp.argsort(disp_sample, axis=-1)             # [B, H, W, D]
        sorted_sample = jnp.take_along_axis(disp_sample, order, axis=-1)
        order_v = order.transpose(0, 3, 1, 2)[..., None]
        sorted_volume = jnp.take_along_axis(volume, order_v, axis=1)
        return sorted_sample, sorted_volume

    x = disp_sample
    xi = x[..., :, None]                                      # [B,H,W,D,1]
    xj = x[..., None, :]                                      # [B,H,W,1,D]
    less = (xj < xi).astype(jnp.int32)
    # stable rank: ties broken by original index (argsort semantics)
    tie = ((xj == xi)
           & (jax.lax.broadcasted_iota(jnp.int32, less.shape, x.ndim)
              < jax.lax.broadcasted_iota(jnp.int32, less.shape, x.ndim - 1))
           ).astype(jnp.int32)
    rank = (less + tie).sum(axis=-1)                          # [B,H,W,D]
    out_pos = jax.lax.broadcasted_iota(jnp.int32, (*x.shape, d), x.ndim)
    onehot = (rank[..., :, None] == out_pos).astype(volume.dtype)
    # sorted[o] = sum_i onehot[i, o] * value[i]
    sorted_sample = jnp.einsum("...io,...i->...o", onehot,
                               x.astype(volume.dtype)).astype(x.dtype)
    sorted_volume = jnp.einsum("bhwio,bihwc->bohwc", onehot, volume)
    return sorted_sample, sorted_volume


def linear_disparity_samples(b: int, h: int, w: int, num_sample: int,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Dense integer hypotheses 0..D-1 broadcast per pixel -> [B, H, W, D].

    Reference: coarse.py:80-81.
    """
    d = jax.lax.broadcasted_iota(dtype, (b, h, w, num_sample), 3)
    return d


def fractional_disparity_samples(low: jnp.ndarray, high: jnp.ndarray,
                                 fractions=(0.0, 3 / 8, 4 / 8, 5 / 8, 1.0)
                                 ) -> jnp.ndarray:
    """Sparse hypotheses at fixed fractions of the [low, high] search range.

    low/high: [B, H, W, 1] -> [B, H, W, len(fractions)].
    Reference: generate_disparity_sample (fine.py:78-95 / precise.py:69-79)
    with its ``[0, 3, 4, 5, 8] / 8`` schedule.
    """
    fr = jnp.asarray(fractions, dtype=low.dtype)
    span = jnp.abs(high - low)
    base = jnp.minimum(low, high)
    return base + span * fr.reshape(1, 1, 1, -1)
