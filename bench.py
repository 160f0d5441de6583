"""End-to-end benchmark: flagship single-frame forward at KITTI eval size.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context: the reference paper (TemporalStereo, arXiv 2211.13755)
reports ~24 fps end-to-end on KITTI-size frames on an RTX-class GPU; the
in-repo op baselines are GTX-3090 microbenchmarks (BASELINE.md).  We bench
frames/s of the full temporal-capable network (single-frame mode) at
384x1248 on one TPU chip and report vs_baseline = fps / 24.0.
"""
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

BASELINE_FPS = 24.0  # reference end-to-end throughput (paper runtime ~42 ms)


def main():
    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import build_model

    cfg = get_cfg(opts=["TRAINER.PRECISION", "bf16"])
    model = build_model(cfg)

    b, h, w = 1, 384, 1248
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)

    print("bench: init...", file=sys.stderr, flush=True)
    variables = jax.jit(
        lambda r: model.init({"params": r}, left, right, None, False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print("bench: compiling forward...", file=sys.stderr, flush=True)

    # streaming throughput: F distinct frames processed sequentially inside
    # one dispatch (lax.map) — mirrors online video inference and amortizes
    # host->device dispatch latency, while every frame is genuinely computed.
    frames = 8
    lefts = jnp.stack([left + 0.01 * i for i in range(frames)])
    rights = jnp.stack([right + 0.01 * i for i in range(frames)])

    @jax.jit
    def forward_stream(lefts, rights):
        def one(pair):
            l, r = pair
            outputs, _ = model.apply(variables, l, r, None, False)
            return outputs["disps"][0]
        return jax.lax.map(one, (lefts, rights))

    out = forward_stream(lefts, rights)
    jax.block_until_ready(out)

    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(forward_stream(lefts, rights))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2] / frames

    fps = b / dt
    print(json.dumps({
        "metric": "temporalstereo_fwd_fps_384x1248",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
