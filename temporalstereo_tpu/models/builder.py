"""Model builders: config tree -> flax modules.

Replaces the reference's registry+configurable builders
(backbone/builder.py:15-25, aggregation/builder.py:12-21,
aggregation/TemporalStereo/TemporalStereo.py:38-78).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..config import ConfigNode
from .stereo import TemporalStereoNet


def _stage_cfg(node: ConfigNode, with_fusion: bool = True) -> Dict[str, Any]:
    cfg = {
        "in_planes": node.get("IN_PLANES"),
        "C": node.get("C"),
        "num_sample": node.get("NUM_SAMPLE"),
        "delta": node.get("DELTA", 1.0),
        "block_cost_scale": node.get("BLOCK_COST_SCALE", 3),
        "topk": node.get("TOPK", 2),
        "norm": node.get("NORM", "BN3d"),
        "activation": node.get("ACTIVATION", "SiLU"),
    }
    if with_fusion:
        cfg["spatial_fusion"] = node.get("SPATIAL_FUSION", True)
    return cfg


def build_model(cfg: ConfigNode, dtype=None) -> TemporalStereoNet:
    """Build the flagship TemporalStereo network from a config tree."""
    from ..ops.cost import configure_pallas

    configure_pallas(cfg.TPU.get("USE_PALLAS", False))
    m = cfg.MODEL
    backbone_cfg = {
        "memory_percent": (m.BACKBONE.get("MEMORY_PERCENT", 0.0)
                           if m.get("WITH_PREVIOUS", False) else 0.0),
        "norm": m.BACKBONE.get("NORM", "BN"),
        "activation": m.BACKBONE.get("ACTIVATION", "SiLU"),
    }
    variant = m.BACKBONE.get("VARIANT", "v2s")
    if variant == "tiny":
        from .backbone import TINY_GROUPS

        backbone_cfg["groups"] = TINY_GROUPS
        backbone_cfg["out_channels"] = (0, 64, 128, 256, 96)
    elif variant != "v2s":
        raise ValueError(f"unknown backbone variant {variant!r}")
    if dtype is None:
        precision = cfg.TRAINER.get("PRECISION", "f32")
        dtype = jnp.bfloat16 if str(precision) in ("bf16", "16") else None
    return TemporalStereoNet(
        backbone_cfg=backbone_cfg,
        coarse_cfg=_stage_cfg(m.AGGREGATION.COARSE),
        fine_cfg=_stage_cfg(m.AGGREGATION.FINE),
        precise_cfg=_stage_cfg(m.AGGREGATION.PRECISE, with_fusion=False),
        with_previous=m.get("WITH_PREVIOUS", False),
        use_past_cost=m.get("USE_PAST_COST", False),
        local_map_size=m.get("LOCAL_MAP_SIZE", 0),
        dtype=dtype,
    )
