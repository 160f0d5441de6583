"""Temporal streaming throughput on the real chip (video-inference mode).

Measures the full online step: memory-spliced backbone + pose reprojection +
fused softmax splat + local map + aggregation — the mode of the reference's
video_inference.py.  Run: python scripts/bench_temporal.py
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import (
        backbone_memory_shapes, build_model, init_prev_info)
    from temporalstereo_tpu.models.temporal import streaming_step

    cfg = get_cfg(opts=[
        "TRAINER.PRECISION", "bf16",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "3",
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg)

    b, h, w = 1, 384, 1248
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    K = jnp.asarray(
        np.tile(np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                         np.float32), (b, 1, 1)))
    baseline = jnp.full((b,), 0.54, jnp.float32)
    T_np = np.eye(4, dtype=np.float32)
    T_np[0, 3] = 0.02
    T_np[2, 3] = -0.5
    T = jnp.asarray(np.tile(T_np, (b, 1, 1)))

    print("init...", file=sys.stderr, flush=True)
    variables = jax.jit(
        lambda r: model.init({"params": r}, left, right, None, False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
    prev = init_prev_info(model, b, (h, w), mem_shapes,
                          model.precise_cfg.get("topk", 2), model.dtype)

    @jax.jit
    def step(left, right, prev):
        outputs, new_prev = streaming_step(
            model, variables, left, right, prev, K, baseline, T)
        return outputs["disps"][0], new_prev

    print("compiling...", file=sys.stderr, flush=True)
    disp, prev = step(left, right, prev)
    jax.block_until_ready((disp, prev))

    iters, chunk = 30, 5
    times = []
    for _ in range(iters // chunk):
        t0 = time.perf_counter()
        for _ in range(chunk):
            disp, prev = step(left, right, prev)
        jax.block_until_ready((disp, prev))
        times.append((time.perf_counter() - t0) / chunk)
    times.sort()
    dt = times[len(times) // 2]
    print(f"temporal streaming: {1e3 * dt:.2f} ms/frame = {b / dt:.1f} fps "
          f"@{h}x{w} bf16")


if __name__ == "__main__":
    sys.exit(main())
