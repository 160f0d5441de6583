"""Test timm/torch -> flax backbone weight import via a synthetic state
dict shaped exactly like timm efficientnetv2 checkpoints."""
import numpy as np

import jax
import jax.numpy as jnp

from temporalstereo_tpu.models.backbone import (
    STEM_CHANNELS,
    TINY_GROUPS,
    TemporalStereoBackbone,
)
from temporalstereo_tpu.training.checkpoint import warm_start
from temporalstereo_tpu.utils.torch_import import import_backbone_weights


def _fake_timm_sd(groups, rng):
    """Synthetic state dict with timm's naming + OIHW shapes."""
    sd = {}
    sd["conv_stem.weight"] = rng.randn(STEM_CHANNELS, 3, 3, 3).astype(
        np.float32)
    for part, shape in (("weight", (STEM_CHANNELS,)),
                        ("bias", (STEM_CHANNELS,)),
                        ("running_mean", (STEM_CHANNELS,)),
                        ("running_var", (STEM_CHANNELS,))):
        sd[f"bn1.{part}"] = (np.ones(shape, np.float32) if "var" in part
                             or part == "weight"
                             else np.zeros(shape, np.float32))

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    in_ch = STEM_CHANNELS
    flat = 0
    for group in groups:
        for spec in group:
            for b in range(spec.repeats):
                t = f"blocks.{flat}.{b}"
                mid = in_ch * spec.expand
                if spec.block_type == "er":
                    sd[f"{t}.conv_exp.weight"] = rng.randn(
                        mid, in_ch, 3, 3).astype(np.float32) * 0.05
                    bn(f"{t}.bn1", mid)
                    sd[f"{t}.conv_pwl.weight"] = rng.randn(
                        spec.channels, mid, 1, 1).astype(np.float32) * 0.05
                    bn(f"{t}.bn2", spec.channels)
                else:
                    sd[f"{t}.conv_pw.weight"] = rng.randn(
                        mid, in_ch, 1, 1).astype(np.float32) * 0.05
                    bn(f"{t}.bn1", mid)
                    sd[f"{t}.conv_dw.weight"] = rng.randn(
                        mid, 1, 3, 3).astype(np.float32) * 0.05
                    bn(f"{t}.bn2", mid)
                    if spec.se_ratio > 0:
                        rd = max(1, int(in_ch * spec.se_ratio))
                        sd[f"{t}.se.conv_reduce.weight"] = rng.randn(
                            rd, mid, 1, 1).astype(np.float32) * 0.05
                        sd[f"{t}.se.conv_reduce.bias"] = np.zeros(
                            rd, np.float32)
                        sd[f"{t}.se.conv_expand.weight"] = rng.randn(
                            mid, rd, 1, 1).astype(np.float32) * 0.05
                        sd[f"{t}.se.conv_expand.bias"] = np.zeros(
                            mid, np.float32)
                    sd[f"{t}.conv_pwl.weight"] = rng.randn(
                        spec.channels, mid, 1, 1).astype(np.float32) * 0.05
                    bn(f"{t}.bn3", spec.channels)
                in_ch = spec.channels
            flat += 1
    return sd


def test_import_backbone_weights_merges(rng):
    bk = TemporalStereoBackbone(memory_percent=0.0, groups=TINY_GROUPS,
                                out_channels=(0, 64, 128, 256, 96))
    x = jnp.zeros((1, 32, 64, 3))
    variables = bk.init({"params": jax.random.PRNGKey(0)}, x, x, None, None,
                        False)

    sd = _fake_timm_sd(TINY_GROUPS, rng)
    p, s, n_avail = import_backbone_weights(sd, TINY_GROUPS)
    assert n_avail > 20

    weights = {"params": p, "batch_stats": s}
    params, stats, n = warm_start(variables["params"],
                                  variables["batch_stats"], weights,
                                  strict=False)
    # every importable tensor must have matched shapes in our tree
    assert n == n_avail, f"matched {n} of {n_avail} imported tensors"

    # forward output actually changes with the imported trunk
    out0 = bk.apply(variables, x, x, None, None, False)[0][0]
    out1 = bk.apply({"params": params, "batch_stats": stats}, x, x, None,
                    None, False)[0][0]
    assert float(jnp.abs(out0 - out1).max()) > 1e-6
