"""Registry-level disparity prediction components.

Re-design of reference ``architecture/modeling/prediction/``
(soft_argmin.py:1-71, argmin.py:1-55, builder.py:1-21): thin configurable
wrappers over ops.sampling, registered so ``build_prediction(cfg)`` works
like the reference registry path.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import ConfigNode
from ..ops.sampling import hard_argmin, soft_argmin
from ..utils.registry import PREDICTION_REGISTRY


@PREDICTION_REGISTRY.register(name="SOFTARGMIN")
class SoftArgmin(nn.Module):
    """softmax(cost * temperature) expectation (soft_argmin.py:38-61)."""
    temperature: float = 1.0
    normalize: bool = True

    def __call__(self, cost: jnp.ndarray, disp_sample: jnp.ndarray
                 ) -> jnp.ndarray:
        return soft_argmin(cost, disp_sample, self.temperature,
                           self.normalize)

    @classmethod
    def from_config(cls, cfg: ConfigNode):
        node = cfg.MODEL.PREDICTION
        return cls(temperature=node.get("TEMPERATURE", 1.0),
                   normalize=node.get("NORMALIZE", True))


@PREDICTION_REGISTRY.register(name="ARGMIN")
class Argmin(nn.Module):
    """Hard argmax + gather (argmin.py:35-46)."""

    def __call__(self, cost: jnp.ndarray, disp_sample: jnp.ndarray
                 ) -> jnp.ndarray:
        return hard_argmin(cost, disp_sample)

    @classmethod
    def from_config(cls, cfg: ConfigNode):
        return cls()


def build_prediction(cfg: ConfigNode):
    """Reference build_prediction (prediction/builder.py:13-21)."""
    name = cfg.MODEL.PREDICTION.get("NAME", "SOFTARGMIN")
    return PREDICTION_REGISTRY.get(name).from_config(cfg)
