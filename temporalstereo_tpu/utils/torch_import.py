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


# ---------------------------------------------------------------------------
# Full reference-checkpoint import (projects/TemporalStereo checkpoints)
# ---------------------------------------------------------------------------
#
# Maps a COMPLETE reference TemporalStereo state_dict (Lightning checkpoint:
# keys under ``backbone.`` and ``aggregation.``) onto our flax tree — the
# true accuracy-parity path for users switching from the reference with
# trained weights.  Name correspondences (reference file:line cited inline):
#
#   backbone.conv_stem/bn1            -> backbone/conv_stem        (:62-64)
#   backbone.block{G}.{S}.{B}.*       -> backbone/g{G}_s{S}_b{B}   (:68-72)
#   backbone.conv32, deconv{32_16,16_8,8_4}.{0,1}
#                                     -> backbone/conv32, deconv*_{0,1} (:78-90)
#   aggregation.{coarse,fine,precise}.init3d.{0,1,2}
#                                     -> Init3D_0/{DepthwiseConv3D_0,
#                                        ResidualBlock3D_0, DepthwiseConv3D_1}
#                                        (coarse.py:36-40)
#   ResidualBlock3D conv1..4/shortcut5,6 -> DepthwiseConv3D_0..5;
#     conv5, conv6 -> DepthwiseConvTranspose3D_0, _1  (module.py:224-266)
#   past_conv / fuse / pred_heads / convex_upsample / refinement / phi
#                                     -> past_conv / PyramidFusion_0 /
#                                        PredictionHeads_0 / ConvexUpsample_0 /
#                                        refinement / phi
#
# Kernel layout rules (torch -> flax):
#   Conv2d   [O,I,kh,kw]        -> (kh,kw,I,O)
#   Conv3d   spatial [O,I,1,kh,kw] -> (kh,kw,I,O);
#            depth  [O,I,kd,1,1]  -> (kd,1,I,O)   (factorized 2D lowering)
#   ConvT2d  [I,O,kh,kw]        -> (kh,kw,I,O)
#   ConvT3d  spatial [I,O,1,kh,kw] -> (kh,kw,I,O);
#            depth  [I,O,kd,1,1]  -> (kd,1,I,O)


class _RefImporter:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.count = 0

    def _get(self, key: str) -> np.ndarray:
        self.count += 1
        return self.sd[key]

    def _bn(self, prefix: str):
        p = {"scale": self._get(f"{prefix}.weight"),
             "bias": self._get(f"{prefix}.bias")}
        s = {"mean": self._get(f"{prefix}.running_mean"),
             "var": self._get(f"{prefix}.running_var")}
        return p, s

    # ------------------------------------------------------------ wrappers
    def conv2d(self, prefix: str, bias: bool = False, norm: bool = True):
        """Reference Conv2d wrapper (basic_layers.py: <p>.weight + <p>.norm)."""
        conv = {"kernel": np.transpose(self._get(f"{prefix}.weight"),
                                       (2, 3, 1, 0))}
        if bias:
            conv["bias"] = self._get(f"{prefix}.bias")
        p: Dict[str, Any] = {"Conv_0": conv}
        s: Dict[str, Any] = {}
        if norm:
            bn_p, bn_s = self._bn(f"{prefix}.norm")
            p["Norm_0"] = {"BatchNorm_0": bn_p}
            s["Norm_0"] = {"BatchNorm_0": bn_s}
        return p, s

    def conv3d(self, prefix: str, kind: str, bias: bool = False,
               norm: bool = True):
        w = self._get(f"{prefix}.weight")  # [O, I, kd, kh, kw]
        if kind == "spatial":  # (1, k, k)
            kernel = np.transpose(w[:, :, 0], (2, 3, 1, 0))
        else:  # depth (k, 1, 1)
            kernel = np.transpose(w[:, :, :, 0, 0], (2, 1, 0))[:, None]
        conv = {"kernel": kernel}
        if bias:
            conv["bias"] = self._get(f"{prefix}.bias")
        p: Dict[str, Any] = {"Conv_0": conv}
        s: Dict[str, Any] = {}
        if norm:
            bn_p, bn_s = self._bn(f"{prefix}.norm")
            p["Norm_0"] = {"BatchNorm_0": bn_p}
            s["Norm_0"] = {"BatchNorm_0": bn_s}
        return p, s

    def convt3d(self, prefix: str, kind: str, norm: bool = True):
        w = self._get(f"{prefix}.weight")  # [I, O, kd, kh, kw]
        if kind == "spatial":
            kernel = np.transpose(w[:, :, 0], (2, 3, 0, 1))
        else:
            kernel = np.transpose(w[:, :, :, 0, 0], (2, 0, 1))[:, None]
        p: Dict[str, Any] = {"ConvTranspose2d_0": {"kernel": kernel}}
        s: Dict[str, Any] = {}
        if norm:
            bn_p, bn_s = self._bn(f"{prefix}.norm")
            p["Norm_0"] = {"BatchNorm_0": bn_p}
            s["Norm_0"] = {"BatchNorm_0": bn_s}
        return p, s

    def dw3d(self, prefix: str, bias: bool = False):
        """DepthwiseConv3D = Sequential(spatial Conv3d, depth Conv3d)
        (module.py:124-147)."""
        p0, s0 = self.conv3d(f"{prefix}.conv.0", "spatial", bias=bias)
        p1, s1 = self.conv3d(f"{prefix}.conv.1", "depth", bias=bias)
        return {"Conv3d_0": p0, "Conv3d_1": p1}, \
               {"Conv3d_0": s0, "Conv3d_1": s1}

    def dwt3d(self, prefix: str):
        p0, s0 = self.convt3d(f"{prefix}.conv.0", "spatial")
        p1, s1 = self.convt3d(f"{prefix}.conv.1", "depth")
        return {"ConvTranspose3d_0": p0, "ConvTranspose3d_1": p1}, \
               {"ConvTranspose3d_0": s0, "ConvTranspose3d_1": s1}

    def resblock3d(self, prefix: str):
        """module.py:224-266: conv1..4 + shortcut5/6 are DepthwiseConv3D,
        conv5/6 are DepthwiseConvTranspose3D."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for ours, ref in (("DepthwiseConv3D_0", "conv1"),
                          ("DepthwiseConv3D_1", "conv2"),
                          ("DepthwiseConv3D_2", "conv3"),
                          ("DepthwiseConv3D_3", "conv4"),
                          ("DepthwiseConv3D_4", "shortcut5"),
                          ("DepthwiseConv3D_5", "shortcut6"),
                          ("DepthwiseConvTranspose3D_0", "conv5"),
                          ("DepthwiseConvTranspose3D_1", "conv6")):
            fn = self.dwt3d if "Transpose" in ours else self.dw3d
            p[ours], s[ours] = fn(f"{prefix}.{ref}")
        return p, s

    def init3d(self, prefix: str, first_bias: bool):
        """coarse/fine/precise init3d Sequential (coarse.py:36-40)."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        p["DepthwiseConv3D_0"], s["DepthwiseConv3D_0"] = self.dw3d(
            f"{prefix}.0", bias=first_bias)
        p["ResidualBlock3D_0"], s["ResidualBlock3D_0"] = self.resblock3d(
            f"{prefix}.1")
        p["DepthwiseConv3D_1"], s["DepthwiseConv3D_1"] = self.dw3d(
            f"{prefix}.2")
        return p, s

    def pred_heads(self, prefix: str):
        """module.py:356-378: each head = Sequential((3,1,1)+norm, (1,3,3))."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for head in ("cost_head", "off_head"):
            p[f"{head}_0"], s[f"{head}_0"] = self.conv3d(
                f"{prefix}.{head}.0", "depth")
            p[f"{head}_1"], _ = self.conv3d(f"{prefix}.{head}.1", "spatial",
                                            norm=False)
        return p, s

    def pyramid_fusion(self, prefix: str):
        """module.py:401-421: conv_5x5 is a (5,1,1) Conv3d, conv_fuse a
        DepthwiseConv3D."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        p["Conv3d_0"], s["Conv3d_0"] = self.conv3d(f"{prefix}.conv_5x5",
                                                   "depth")
        p["DepthwiseConv3D_0"], s["DepthwiseConv3D_0"] = self.dw3d(
            f"{prefix}.conv_fuse")
        return p, s

    def convex_upsample(self, prefix: str):
        """module.py:310-316: plain Sequential conv/BN/act/conv."""
        c0 = {"Conv_0": {"kernel": np.transpose(
            self._get(f"{prefix}.mask.0.weight"), (2, 3, 1, 0)),
            "bias": self._get(f"{prefix}.mask.0.bias")}}
        bn_p, bn_s = self._bn(f"{prefix}.mask.1")
        c0["Norm_0"] = {"BatchNorm_0": bn_p}
        c1 = {"Conv_0": {"kernel": np.transpose(
            self._get(f"{prefix}.mask.3.weight"), (2, 3, 1, 0)),
            "bias": self._get(f"{prefix}.mask.3.bias")}}
        return {"Conv2d_0": c0, "Conv2d_1": c1}, \
               {"Conv2d_0": {"Norm_0": {"BatchNorm_0": bn_s}}}

    def unet(self, prefix: str):
        """module.py:424-457."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for ours, ref in (("conv2_0", "conv2.0"), ("conv2_1", "conv2.1"),
                          ("conv4_0", "conv4.0"), ("conv4_1", "conv4.1"),
                          ("fuse_0", "fuse.0"), ("fuse_1", "fuse.1"),
                          ("concat", "concat")):
            p[ours], s[ours] = self.conv2d(f"{prefix}.{ref}")
        # deconv4: ConvTranspose2d wrapper with norm + bias
        w = self._get(f"{prefix}.deconv4.weight")  # [I, O, kh, kw]
        bn_p, bn_s = self._bn(f"{prefix}.deconv4.norm")
        p["deconv4"] = {"kernel": np.transpose(w, (2, 3, 0, 1)),
                        "bias": self._get(f"{prefix}.deconv4.bias"),
                        "Norm_0": {"BatchNorm_0": bn_p}}
        s["deconv4"] = {"Norm_0": {"BatchNorm_0": bn_s}}
        # deconv2: plain nn.ConvTranspose2d
        w = self._get(f"{prefix}.deconv2.weight")
        p["deconv2"] = {"kernel": np.transpose(w, (2, 3, 0, 1)),
                        "bias": self._get(f"{prefix}.deconv2.bias")}
        return p, s

    def stage(self, prefix: str, which: str):
        """coarse.py / fine.py / precise.py module sets."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        # init3d.0 has bias=True in all three stages (coarse.py:37,
        # fine.py:37, precise.py:33)
        p["Init3D_0"], s["Init3D_0"] = self.init3d(
            f"{prefix}.init3d", first_bias=True)
        p["PredictionHeads_0"], s["PredictionHeads_0"] = self.pred_heads(
            f"{prefix}.pred_heads")
        if which in ("coarse", "fine"):
            p["past_conv"], s["past_conv"] = self.conv3d(
                f"{prefix}.past_conv", "spatial")
            if f"{prefix}.fuse.conv_5x5.weight" in self.sd:
                p["PyramidFusion_0"], s["PyramidFusion_0"] = \
                    self.pyramid_fusion(f"{prefix}.fuse")
            p["ConvexUpsample_0"], s["ConvexUpsample_0"] = \
                self.convex_upsample(f"{prefix}.convex_upsample")
        if which == "fine":
            p["phi"] = self._get(f"{prefix}.phi")
        if which == "precise":
            p["refinement"], s["refinement"] = self.unet(
                f"{prefix}.refinement")
        return p, s


def import_reference_checkpoint(sd: Dict[str, np.ndarray], groups=None
                                ) -> Tuple[Dict[str, Any], Dict[str, Any],
                                           int]:
    """Map a full reference TemporalStereo state_dict onto our variable
    trees.  Returns (params, batch_stats, n_reference_tensors_consumed);
    merge with training.checkpoint.warm_start(strict=False)."""
    from ..models.backbone import V2S_GROUPS

    if groups is None:
        groups = V2S_GROUPS
    imp = _RefImporter(sd)

    # ---- backbone trunk: re-key block{G}.{S}.{B} -> timm blocks.{flat}.{B}
    trunk_sd: Dict[str, np.ndarray] = {}
    if "backbone.conv_stem.weight" in sd:
        trunk_sd["conv_stem.weight"] = sd["backbone.conv_stem.weight"]
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            trunk_sd[f"bn1.{suffix}"] = sd[f"backbone.bn1.{suffix}"]
    flat = 0
    for gi, group in enumerate(groups):
        for si, _ in enumerate(group):
            ref_stage = f"backbone.block{gi}.{si}."
            for k, v in sd.items():
                if k.startswith(ref_stage):
                    trunk_sd[f"blocks.{flat}.{k[len(ref_stage):]}"] = v
            flat += 1
    bb_p, bb_s, n_trunk = import_backbone_weights(trunk_sd, groups)
    imp.count += n_trunk

    # ---- backbone FPN decoder (:78-90)
    if "backbone.conv32.weight" in sd:
        bb_p["conv32"], _ = imp.conv2d("backbone.conv32", norm=False)
        for ours, ref in (("deconv32_16", "deconv32_16"),
                          ("deconv16_8", "deconv16_8"),
                          ("deconv8_4", "deconv8_4")):
            bb_p[f"{ours}_0"], bb_s[f"{ours}_0"] = imp.conv2d(
                f"backbone.{ref}.0")
            bb_p[f"{ours}_1"], _ = imp.conv2d(f"backbone.{ref}.1",
                                              norm=False)

    params: Dict[str, Any] = {"backbone": bb_p}
    stats: Dict[str, Any] = {"backbone": bb_s}

    # ---- aggregation cascade
    if "aggregation.coarse.pred_heads.cost_head.0.weight" in sd:
        agg_p: Dict[str, Any] = {}
        agg_s: Dict[str, Any] = {}
        for which in ("coarse", "fine", "precise"):
            agg_p[which], agg_s[which] = imp.stage(
                f"aggregation.{which}", which)
        params["aggregation"] = agg_p
        stats["aggregation"] = agg_s

    return params, stats, imp.count


def load_reference_checkpoint(variables: Dict[str, Any], path: str
                              ) -> Tuple[Dict[str, Any], int]:
    """Load a reference Lightning .ckpt/.pth and merge every mappable tensor
    into the model variables (strict=False)."""
    from ..training.checkpoint import warm_start

    sd = load_torch_state_dict(path)
    p, s, _ = import_reference_checkpoint(sd)
    params, stats, n = warm_start(variables["params"],
                                  variables.get("batch_stats", {}),
                                  {"params": p, "batch_stats": s},
                                  strict=False)
    return {"params": params, "batch_stats": stats}, n


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
