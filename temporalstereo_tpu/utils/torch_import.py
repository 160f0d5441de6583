"""Import timm/torch EfficientNetV2 weights into the flax backbone.

The reference builds its trunk from timm's ImageNet-pretrained
``efficientnetv2_rw_s`` (backbone/TemporalStereo.py:60).  This module maps a
torch ``state_dict`` (as a .pth file or an in-memory dict of numpy arrays)
onto our flax parameter tree so accuracy-parity experiments can start from
the same initialization.

Mapping (timm name -> ours):
  conv_stem.weight / bn1.*              -> backbone/conv_stem/*
  blocks.{S}.{B}.conv_exp|conv_pw|conv_dw|conv_pwl|se.* + bn1..bn3
                                        -> backbone/g{gi}_s{si}_b{B}/*
  with flat stage S enumerating (gi, si) in order: (0,0)=0, (1,0)=1,
  (2,0)=2, (3,0)=3, (3,1)=4, (4,0)=5.

Conv kernels are transposed OIHW -> HWIO (depthwise: OIHW[O,1,k,k] ->
HWIO[k,k,C,1] with feature_group_count semantics).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    # torch OIHW -> flax HWIO
    if depthwise:
        # torch depthwise [C, 1, kh, kw] -> flax [kh, kw, 1, C]
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w, (2, 3, 1, 0))


def _bn(params: Dict[str, np.ndarray], prefix: str):
    return {
        "scale": params[f"{prefix}.weight"],
        "bias": params[f"{prefix}.bias"],
    }, {
        "mean": params[f"{prefix}.running_mean"],
        "var": params[f"{prefix}.running_var"],
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def import_backbone_weights(sd: Dict[str, np.ndarray], groups,
                            strip_prefix: str = ""
                            ) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Build (params, batch_stats) subtrees for TemporalStereoBackbone's
    trunk from a timm efficientnetv2 state_dict.

    Returns (params, batch_stats, n_imported_tensors); decoder/FPN weights
    (ours only) are not produced — merge with warm_start(strict=False).
    """
    if strip_prefix:
        sd = {k[len(strip_prefix):]: v for k, v in sd.items()
              if k.startswith(strip_prefix)}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    count = 0

    def put(name: str, p: Dict[str, Any], s: Dict[str, Any] | None):
        nonlocal count
        params[name] = p
        if s is not None:
            stats[name] = s
        count += sum(1 for _ in _leaves(p)) + (
            sum(1 for _ in _leaves(s)) if s else 0)

    # stem: Conv2d wrapper = {Conv_0: kernel, BatchNorm_0 via Norm_0}
    if "conv_stem.weight" in sd:
        bn_p, bn_s = _bn(sd, "bn1")
        put("conv_stem", {
            "Conv_0": {"kernel": _conv_kernel(sd["conv_stem.weight"])},
            "Norm_0": {"BatchNorm_0": bn_p},
        }, {"Norm_0": {"BatchNorm_0": bn_s}})

    flat_stage = 0
    for gi, group in enumerate(groups):
        for si, spec in enumerate(group):
            for b in range(spec.repeats):
                t = f"blocks.{flat_stage}.{b}"
                name = f"g{gi}_s{si}_b{b}"
                if spec.block_type == "er":
                    if f"{t}.conv_exp.weight" not in sd:
                        continue
                    bn1_p, bn1_s = _bn(sd, f"{t}.bn1")
                    bn2_p, bn2_s = _bn(sd, f"{t}.bn2")
                    put(name, {
                        "conv_exp": {
                            "Conv_0": {"kernel": _conv_kernel(
                                sd[f"{t}.conv_exp.weight"])},
                            "Norm_0": {"BatchNorm_0": bn1_p},
                        },
                        "conv_pwl": {
                            "Conv_0": {"kernel": _conv_kernel(
                                sd[f"{t}.conv_pwl.weight"])},
                            "Norm_0": {"BatchNorm_0": bn2_p},
                        },
                    }, {
                        "conv_exp": {"Norm_0": {"BatchNorm_0": bn1_s}},
                        "conv_pwl": {"Norm_0": {"BatchNorm_0": bn2_s}},
                    })
                else:  # inverted residual
                    if f"{t}.conv_pw.weight" not in sd:
                        continue
                    bn1_p, bn1_s = _bn(sd, f"{t}.bn1")
                    bn2_p, bn2_s = _bn(sd, f"{t}.bn2")
                    bn3_p, bn3_s = _bn(sd, f"{t}.bn3")
                    block_p = {
                        "conv_pw": {
                            "Conv_0": {"kernel": _conv_kernel(
                                sd[f"{t}.conv_pw.weight"])},
                            "Norm_0": {"BatchNorm_0": bn1_p},
                        },
                        "conv_dw": {
                            "Conv_0": {"kernel": _conv_kernel(
                                sd[f"{t}.conv_dw.weight"], depthwise=True)},
                            "BatchNorm_0": bn2_p,
                        },
                        "conv_pwl": {
                            "Conv_0": {"kernel": _conv_kernel(
                                sd[f"{t}.conv_pwl.weight"])},
                            "Norm_0": {"BatchNorm_0": bn3_p},
                        },
                    }
                    block_s = {
                        "conv_pw": {"Norm_0": {"BatchNorm_0": bn1_s}},
                        "conv_dw": {"BatchNorm_0": bn2_s},
                        "conv_pwl": {"Norm_0": {"BatchNorm_0": bn3_s}},
                    }
                    if f"{t}.se.conv_reduce.weight" in sd:
                        block_p["se"] = {
                            "reduce": {
                                "kernel": _conv_kernel(
                                    sd[f"{t}.se.conv_reduce.weight"]),
                                "bias": sd[f"{t}.se.conv_reduce.bias"],
                            },
                            "expand": {
                                "kernel": _conv_kernel(
                                    sd[f"{t}.se.conv_expand.weight"]),
                                "bias": sd[f"{t}.se.conv_expand.bias"],
                            },
                        }
                    put(name, block_p, block_s)
            flat_stage += 1

    return params, stats, count


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def warm_start_backbone(variables: Dict[str, Any], torch_path: str,
                        groups=None, backbone_scope: str = "backbone"
                        ) -> Tuple[Dict[str, Any], int]:
    """Load a timm checkpoint file and merge it into a model variable dict
    (strict=False semantics on the backbone subtree)."""
    from ..models.backbone import V2S_GROUPS
    from ..training.checkpoint import warm_start

    if groups is None:
        groups = V2S_GROUPS
    sd = load_torch_state_dict(torch_path)
    p, s, _ = import_backbone_weights(sd, groups)
    weights = {"params": {backbone_scope: p},
               "batch_stats": {backbone_scope: s}}
    params, stats, n = warm_start(variables["params"],
                                  variables.get("batch_stats", {}),
                                  weights, strict=False)
    return {"params": params, "batch_stats": stats}, n
