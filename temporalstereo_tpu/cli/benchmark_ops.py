"""Op-level microbenchmarks on TPU, mirroring the reference's in-repo
GTX-3090 numbers (BASELINE.md):

  * block_cost @1/16 KITTI size, C=192, 12 samples (block_cost.py:94-111)
  * block_cost @1/4, C=48, 4 samples (BASELINE: 1.7147 ms)
  * cat_fms dense 48 samples @1/4 (BASELINE: 5.3421 ms)
  * dif_fms dense (BASELINE: 8.3691 ms)
  * correlation2d patch 21 @1/16 (BASELINE: 0.6607 ms)
  * softmax splat @1/8 (the CUDA-kernel replacement)

Run: python -m temporalstereo_tpu.cli.benchmark_ops
"""
from __future__ import annotations

import json

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp  # noqa: E402

from ..ops import (  # noqa: E402
    block_cost,
    cat_fms,
    dif_fms,
    softsplat,
)
from ..ops.correlation import correlation2d  # noqa: E402
from ..utils.benchmark import report, time_test_device  # noqa: E402


def main() -> None:
    rng = np.random.RandomState(0)
    results = {}

    # profiler-derived on-device time per execution (see time_test_device)
    def t(fn, *args):
        return time_test_device(fn, *args)

    # KITTI sizes (reference block_cost.py:99-100)
    h16, w16 = 384 // 16, 1248 // 16
    h4, w4 = 384 // 4, 1248 // 4
    h8, w8 = 384 // 8, 1248 // 8

    # block_cost int path @1/16, C=192, 12 samples
    left = jnp.asarray(rng.rand(1, h16, w16, 192), jnp.float32)
    right = jnp.asarray(rng.rand(1, h16, w16, 192), jnp.float32)
    t_ = t(lambda l, r: block_cost(l, r, 12), left, right)
    results["block_cost_int_1_16"] = report("BLOCK_COST int @1/16 C192", t_)

    # block_cost tensor path @1/4, C=48, 4 samples (BASELINE 1.7147 ms)
    left = jnp.asarray(rng.rand(1, h4, w4, 48), jnp.float32)
    right = jnp.asarray(rng.rand(1, h4, w4, 48), jnp.float32)
    disp = jnp.asarray(rng.rand(1, 4, h4, w4) * w4, jnp.float32)
    t_ = t(lambda l, r, d: block_cost(l, r, d), left, right, disp)
    results["block_cost_1_4"] = report("BLOCK_COST @1/4 C48 D4", t_)

    # cat_fms dense 48 @1/4 (BASELINE 5.3421 ms) — int fast path
    t_ = t(lambda l, r: cat_fms(l, r, 48), left, right)
    results["cat_fms_dense"] = report("CAT_FMS dense 48 @1/4", t_)

    # dif_fms dense (BASELINE 8.3691 ms)
    t_ = t(lambda l, r: dif_fms(l, r, 48), left, right)
    results["dif_fms_dense"] = report("DIF_FMS dense 48 @1/4", t_)

    # correlation2d patch 21 @1/16 (BASELINE 0.6607 ms)
    f1 = jnp.asarray(rng.rand(1, h16, w16, 64), jnp.float32)
    f2 = jnp.asarray(rng.rand(1, h16, w16, 64), jnp.float32)
    t_ = t(lambda a, b: correlation2d(a, b, 21), f1, f2)
    results["correlation2d"] = report("CORRELATION2D p21 @1/16", t_)

    # fused cost-volume base kernel (ops/pallas/cost.py) vs the XLA
    # formulation it replaces, at the model's precise-stage shape
    # (C=128 = backbone x4 + UNet guidance, D=5, 1/4 res, bf16)
    from ..ops.cost import groupwise_correlation
    from ..ops.pallas.cost import fused_cost_base_pallas
    from ..ops.warp import shift_1d_matmul

    def xla_base(l, r, d):
        b, h, w, c = l.shape
        dd = d.shape[1]
        ref = jnp.broadcast_to(l[:, None], (b, dd, h, w, c))
        tgt = shift_1d_matmul(r[:, None], -d)
        return jnp.concatenate(
            [ref, tgt, groupwise_correlation(ref, tgt)], axis=-1)

    for tag, (hh, ww, cc, dd) in {
        "precise_1_4": (h4, w4, 128, 5),
        "fine_1_8": (h8, w8, 128, 10),
    }.items():
        left = jnp.asarray(rng.rand(1, hh, ww, cc), jnp.bfloat16)
        right = jnp.asarray(rng.rand(1, hh, ww, cc), jnp.bfloat16)
        disp = jnp.asarray(rng.rand(1, dd, hh, ww) * 24, jnp.bfloat16)
        t_ = t(xla_base, left, right, disp)
        results[f"cost_base_xla_{tag}"] = report(
            f"COST BASE xla {tag} C{cc} D{dd}", t_)
        try:
            t_ = t(fused_cost_base_pallas, left, right, disp)
            results[f"cost_base_pallas_{tag}"] = report(
                f"COST BASE pallas {tag} C{cc} D{dd}", t_)
        except Exception as e:  # pragma: no cover - env-dependent
            print(f"pallas cost kernel unavailable ({type(e).__name__}): "
                  f"{e}")

    # softmax splat @1/8 x 16 channels (CUDA-kernel replacement)
    vals = jnp.asarray(rng.rand(1, h8, w8, 16), jnp.float32)
    flow = jnp.asarray(rng.randn(1, h8, w8, 2) * 4, jnp.float32)
    metric = jnp.asarray(rng.randn(1, h8, w8, 1), jnp.float32)
    t_ = t(lambda v, f, m: softsplat(v, f, m, "softmax"),
           vals, flow, metric)
    results["softsplat_1_8"] = report("SOFTSPLAT softmax @1/8 C16", t_)

    print(json.dumps({k: v for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
