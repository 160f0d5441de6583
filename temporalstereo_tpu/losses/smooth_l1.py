"""Multi-scale smooth-L1 disparity loss.

TPU-native re-design of reference
``architecture/modeling/losses/smooth_l1_loss.py`` (DispSmoothL1Loss :9-108).
Differences from the reference driven by jit: the empty-mask warning branch
(:63-67) becomes a ``jnp.where`` on the valid count, so the loss is a single
static graph.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import jax.numpy as jnp

from ..ops.interpolate import adaptive_avg_pool2d, adaptive_max_pool2d


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber), torch F.smooth_l1_loss semantics."""
    a = jnp.abs(diff)
    return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)


def _rescale_gt(gt: jnp.ndarray, h: int, w: int, sparse: bool):
    """Rescale gt to (h, w): divide values by the width ratio, then
    max-pool (sparse) or avg-pool (dense) — reference :49-57."""
    gh, gw = gt.shape[1:3]
    if (gh, gw) == (h, w):
        return gt, 1.0
    scale = gw / w
    scaled = gt / scale
    pool = adaptive_max_pool2d if sparse else adaptive_avg_pool2d
    return pool(scaled, (h, w)), scale


class DispSmoothL1Loss:
    """est disparities (list of [B,H,W,1]) + gt [B,H,W,1] -> loss dict."""

    def __init__(self, max_disp: int = 192, start_disp: int = 0,
                 global_weight: float = 1.0,
                 weights: Union[Sequence[float], None] = None,
                 sparse: bool = False):
        self.max_disp = max_disp
        self.start_disp = start_disp
        self.global_weight = global_weight
        self.weights = weights
        self.sparse = sparse

    @classmethod
    def from_config(cls, node) -> "DispSmoothL1Loss":
        return cls(
            max_disp=node.get("MAX_DISP", 192),
            start_disp=node.get("START_DISP", 0),
            global_weight=node.get("GLOBAL_WEIGHT", 1.0),
            weights=node.get("WEIGHTS", None),
            sparse=node.get("SPARSE", False),
        )

    def loss_per_level(self, est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        h, w = est.shape[1:3]
        scaled_gt, scale = _rescale_gt(gt, h, w, self.sparse)
        mask = ((scaled_gt > self.start_disp)
                & (scaled_gt < self.max_disp / scale))
        maskf = mask.astype(est.dtype)
        n = maskf.sum()
        masked = (smooth_l1(est - scaled_gt) * maskf).sum() / jnp.maximum(n, 1.0)
        # empty-mask fallback (reference :63-67): unmasked abs-mean of zeros
        fallback = (jnp.abs(est - scaled_gt) * maskf).mean()
        return jnp.where(n >= 1.0, masked, fallback)

    def __call__(self, est_disps, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if not isinstance(est_disps, (list, tuple)):
            est_disps = [est_disps]
        weights = list(self.weights or [1.0])
        while len(weights) < len(est_disps):
            weights.append(weights[-1])
        out = {}
        for i, est in enumerate(est_disps):
            out[f"l1_loss_lvl{i}"] = (weights[i] * self.global_weight
                                      * self.loss_per_level(est, gt))
        return out
