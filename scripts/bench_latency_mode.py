"""Latency-mode temporal serving: what a real-time caller sees per frame.

The round-3 record is throughput-shaped (chunk-8 scan, marginal-time
device steady state).  A latency-sensitive deployment dispatches ONE frame
at a time and waits for the disparity; this script measures that operating
point directly — per-frame wall latency of a chunk-1 steady-state
streaming step with donated carried state — across stream counts and chunk
sizes, giving the latency/throughput trade-off curve next to the DMA
ceiling analysis (docs/PERF.md; VERDICT r3 next-step #6).

Note the sandbox tunnel adds ~25-30 ms per dispatch that directly-attached
TPUs do not pay; both the raw wall number and the tunnel-corrected device
estimate (chunk-2 minus chunk-1 marginal) are reported.

Run: python scripts/bench_latency_mode.py [--streams 1,2] [--chunks 1,2,4,8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def _median(times):
    times = sorted(times)
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="1,2")
    ap.add_argument("--chunks", default="1,2,4,8")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1248)
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

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
    h, w = args.height, args.width
    rng = np.random.RandomState(0)

    results = []
    for b in [int(x) for x in args.streams.split(",")]:
        left = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
        right = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
        K = jnp.asarray(np.tile(np.array(
            [[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]], np.float32),
            (b, 1, 1)))
        baseline = jnp.full((b,), 0.54, jnp.float32)
        T_np = np.eye(4, dtype=np.float32)
        T_np[0, 3], T_np[2, 3] = 0.02, -0.5
        T = jnp.asarray(np.tile(T_np, (b, 1, 1)))

        variables = jax.jit(lambda r: model.init(
            {"params": r}, left, right, None, False))(jax.random.PRNGKey(0))
        mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
        prev0 = init_prev_info(model, b, (h, w), mem_shapes,
                               model.precise_cfg.get("topk", 2), model.dtype)

        chunk_wall = {}
        for frames in [int(x) for x in args.chunks.split(",")]:
            lefts = jnp.stack([left + 0.01 * i for i in range(frames)])
            rights = jnp.stack([right + 0.01 * i for i in range(frames)])

            # donate the carried state: steady-state streaming never needs
            # the old PrevInfo again, so XLA can reuse its buffers in place
            @jax.jit
            def chunk(lefts, rights, prev):
                def body(p, lr):
                    l, r = lr
                    outputs, new_p = streaming_step(
                        model, variables, l, r, p, K, baseline, T)
                    return new_p, outputs["disps"][0]
                new_prev, disps = jax.lax.scan(body, prev, (lefts, rights))
                return disps, new_prev

            print(f"compiling b={b} chunk={frames}...", file=sys.stderr,
                  flush=True)
            prev = prev0
            disps, prev = jax.block_until_ready(chunk(lefts, rights, prev))
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                disps, prev = chunk(lefts + 0.001, rights + 0.001, prev)
                jax.block_until_ready(disps)
                times.append(time.perf_counter() - t0)
            wall = _median(times)
            chunk_wall[frames] = wall
            print(f"b={b} chunk={frames}: {1e3 * wall:.1f} ms/dispatch = "
                  f"{1e3 * wall / frames:.1f} ms/frame wall "
                  f"({b * frames / wall:.1f} frames/s aggregate, "
                  f"{frames / wall:.1f} fps/stream incl. dispatch)",
                  flush=True)
            results.append({"streams": b, "chunk": frames,
                            "wall_ms_per_frame": 1e3 * wall / frames,
                            "fps_per_stream": frames / wall,
                            "aggregate_fps": b * frames / wall})
        if 1 in chunk_wall and 2 in chunk_wall:
            dev = max(chunk_wall[2] - chunk_wall[1], 1e-9)
            print(f"b={b}: tunnel-corrected device latency ~"
                  f"{1e3 * dev:.1f} ms/frame "
                  f"({1 / dev:.1f} fps/stream device-side)", flush=True)

    print("\nLatency-mode summary (real-time bar = 24 fps/stream):")
    for r in results:
        tag = "REAL-TIME" if r["fps_per_stream"] >= 24 else "below bar"
        print(f"  streams={r['streams']} chunk={r['chunk']}: "
              f"{r['wall_ms_per_frame']:.1f} ms/frame, "
              f"{r['fps_per_stream']:.1f} fps/stream [{tag}]")


if __name__ == "__main__":
    sys.exit(main())
