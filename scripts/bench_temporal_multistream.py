"""Multi-stream temporal serving throughput: B independent videos streamed
concurrently in one batch (one PrevInfo per stream, batched in the leading
axis) — the deployment mode for serving many camera feeds from one chip.

Methodology matches bench.py: 8 distinct frames per dispatch chained through
the PrevInfo carry by lax.scan, marginal per-frame time from two chunk
lengths (subtracts the per-dispatch tunnel latency).

Run: python scripts/bench_temporal_multistream.py [batch]
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


def _median_time(fn, *args, iters=8):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import (
        backbone_memory_shapes, build_model, init_prev_info)
    from temporalstereo_tpu.models.temporal import streaming_step

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = get_cfg(opts=[
        "TRAINER.PRECISION", "bf16",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "3",
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg)

    h, w = 384, 1248
    frames = 8
    rng = np.random.RandomState(0)
    # bf16 serving input format (see bench.py): removes the full-res
    # f32->bf16 convert + relayout DMA per frame
    left = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
    right = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
    K = jnp.asarray(
        np.tile(np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                         np.float32), (b, 1, 1)))
    baseline = jnp.full((b,), 0.54, jnp.float32)
    T_np = np.eye(4, dtype=np.float32)
    T_np[0, 3] = 0.02
    T_np[2, 3] = -0.5
    T = jnp.asarray(np.tile(T_np, (b, 1, 1)))

    print(f"multistream bench: init (b={b})...", file=sys.stderr, flush=True)
    variables = jax.jit(
        lambda r: model.init({"params": r}, left, right, None, False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
    prev = init_prev_info(model, b, (h, w), mem_shapes,
                          model.precise_cfg.get("topk", 2), model.dtype)

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

    print("multistream bench: compiling...", file=sys.stderr, flush=True)
    frames2 = 2 * frames
    lefts2 = jnp.concatenate([lefts, lefts + 0.5])
    rights2 = jnp.concatenate([rights, rights + 0.5])
    t1 = _median_time(stream_chunk, lefts, rights, prev)
    t2 = _median_time(stream_chunk, lefts2, rights2, prev)
    dt = max(t2 - t1, 1e-9) / (frames2 - frames)
    print(f"b={b}: {1e3 * dt:.2f} ms per {b}-stream frame step -> "
          f"aggregate {b / dt:.1f} frames/s, {1 / dt:.1f} fps per stream "
          f"({b * frames / t1:.1f} frames/s incl. per-chunk dispatch)",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
