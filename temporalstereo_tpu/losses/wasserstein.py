"""Wasserstein-style distribution loss on cost volumes.

TPU-native re-design of reference
``architecture/modeling/losses/warsserstein_distance_loss.py`` (:9-127):
``sum_D (softmax(cost) + 0.25) * |sample + offset - gt|`` over hypotheses,
with the same masking/rescaling as the L1 loss.  Layout: sample-last
[B, H, W, D].
"""
from __future__ import annotations

from typing import Dict, Sequence, Union

import jax
import jax.numpy as jnp

from .smooth_l1 import _rescale_gt


class WassersteinDistanceLoss:
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
    def from_config(cls, node) -> "WassersteinDistanceLoss":
        return cls(
            max_disp=node.get("MAX_DISP", 192),
            start_disp=node.get("START_DISP", 0),
            global_weight=node.get("GLOBAL_WEIGHT", 1.0),
            weights=node.get("WEIGHTS", None),
            sparse=node.get("SPARSE", False),
        )

    def loss_per_level(self, cost: jnp.ndarray, offset: jnp.ndarray,
                      disp_sample: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        h, w = cost.shape[1:3]
        prob = jax.nn.softmax(cost, axis=-1)
        scaled_gt, scale = _rescale_gt(gt, h, w, self.sparse)
        mask = ((scaled_gt > self.start_disp)
                & (scaled_gt < self.max_disp / scale))
        maskf = mask.astype(cost.dtype)            # [B, H, W, 1]
        dist = jnp.abs(offset + disp_sample - scaled_gt)
        # (0.25 + P(d)) weighting (reference :74-76); mean over pixels of the
        # per-pixel sum over hypotheses
        war = ((prob + 0.25) * dist * maskf).sum(axis=-1).mean()
        fallback = (prob * dist * maskf).sum(axis=-1).mean()
        n = maskf.sum()
        return jnp.where(n >= 1.0, war, fallback)

    def __call__(self, costs, offsets, disp_samples,
                 gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if not isinstance(costs, (list, tuple)):
            costs = [costs]
        if not isinstance(offsets, (list, tuple)):
            offsets = [offsets]
        if not isinstance(disp_samples, (list, tuple)):
            disp_samples = [disp_samples] * len(costs)
        assert len(costs) == len(offsets)
        weights = list(self.weights or [1.0])
        while len(weights) < len(costs):
            weights.append(weights[-1])
        out = {}
        for i, (c, o, s) in enumerate(zip(costs, offsets, disp_samples)):
            assert c.shape == o.shape == s.shape, (c.shape, o.shape, s.shape)
            out[f"wars_loss_lvl{i}"] = (weights[i] * self.global_weight
                                        * self.loss_per_level(c, o, s, gt))
        return out
