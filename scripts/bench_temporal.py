"""Temporal streaming throughput on the real chip (video-inference mode).

Measures the full online step: memory-spliced backbone + pose reprojection +
fused softmax splat + local map + aggregation — the mode of the reference's
video_inference.py.  Run: python scripts/bench_temporal.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    # no donate_argnums: init_prev_info aliases zero buffers across pytree
    # leaves (CostMemory.zeros), and donating an aliased buffer is invalid
    @jax.jit
    def step(left, right, prev):
        outputs, new_prev = streaming_step(
            model, variables, left, right, prev, K, baseline, T)
        return outputs["disps"][0], new_prev

    # scan-chained: F distinct frames inside one dispatch, prev carried
    # through the scan — the state dependency serializes frames exactly as
    # online streaming does, but without per-dispatch tunnel latency
    frames = 8
    lefts = jnp.stack([left + 0.01 * i for i in range(frames)])
    rights = jnp.stack([right + 0.01 * i for i in range(frames)])

    @jax.jit
    def stream_chunk(lefts, rights, prev):
        def body(p, lr):
            l, r = lr
            outputs, new_p = streaming_step(
                model, variables, l, r, p, K, baseline, T)
            return new_p, outputs["disps"][0]
        new_prev, disps = jax.lax.scan(body, prev, (lefts, rights))
        return disps, new_prev

    print("compiling...", file=sys.stderr, flush=True)
    disps, prev_s = stream_chunk(lefts, rights, prev)
    jax.block_until_ready((disps, prev_s))
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        disps, prev_s = stream_chunk(lefts, rights, prev_s)
        jax.block_until_ready(disps)
        times.append((time.perf_counter() - t0) / frames)
    times.sort()
    dt = times[len(times) // 2]
    print(f"temporal streaming (scan-chained, device-serial): "
          f"{1e3 * dt:.2f} ms/frame = {b / dt:.1f} fps @{h}x{w} bf16")

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
    print(f"temporal streaming (per-dispatch, includes ~25 ms tunnel "
          f"latency pipelining): {1e3 * dt:.2f} ms/frame = {b / dt:.1f} fps "
          f"@{h}x{w} bf16")


if __name__ == "__main__":
    sys.exit(main())
