"""Compiler-option experiments against the un-attributed DMA/copy share.

The round-3 profile attributes 46% of temporal-step device time to
weight-prefetch/layout DMA (docs/PERF.md).  Round 3 measured one knob
(scoped VMEM 64 MiB: neutral-to-worse); this script makes such experiments
one-liners: compile the flagship temporal streaming chunk under a given
``compiler_options`` dict and report the marginal steady-state fps next to
the default build.

Run: python scripts/bench_compiler_knobs.py [--knob name=value ...]
Default sweep: latency-hiding scheduler OFF (is XLA's async-prefetch
schedule helping or hurting at this op-count?).
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", action="append", default=[],
                    help="name=value compiler option (repeatable); one "
                         "build per invocation set")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1248)
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
    b, h, w = 1, args.height, args.width
    frames = 8
    rng = np.random.RandomState(0)
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
    prev = init_prev_info(model, b, (h, w), mem_shapes,
                          model.precise_cfg.get("topk", 2), model.dtype)
    lefts = jnp.stack([left + 0.01 * i for i in range(frames)])
    rights = jnp.stack([right + 0.01 * i for i in range(frames)])
    lefts2 = jnp.concatenate([lefts, lefts + 0.5])
    rights2 = jnp.concatenate([rights, rights + 0.5])

    def stream_chunk(lefts, rights, prev):
        def body(p, lr):
            l, r = lr
            outputs, new_p = streaming_step(
                model, variables, l, r, p, K, baseline, T)
            return new_p, outputs["disps"][0]
        new_prev, disps = jax.lax.scan(body, prev, (lefts, rights))
        return disps, new_prev

    def measure(tag, options):
        jitted = jax.jit(stream_chunk, compiler_options=options or None)
        print(f"[{tag}] compiling (options={options})...", file=sys.stderr,
              flush=True)
        try:
            t1 = _median_time(jitted, lefts, rights, prev)
            t2 = _median_time(jitted, lefts2, rights2, prev)
        except Exception as e:
            print(f"[{tag}] FAILED: {type(e).__name__}: {e}", flush=True)
            return
        dt = max(t2 - t1, 1e-9) / frames
        print(f"[{tag}] {1e3 * dt:.2f} ms/frame marginal = {1 / dt:.2f} fps "
              f"steady-state", flush=True)

    measure("default", {})
    knobs = {}
    for kv in args.knob:
        k, _, v = kv.partition("=")
        knobs[k] = v
    if not knobs:
        knobs = {"xla_tpu_enable_latency_hiding_scheduler": "false"}
    measure("+".join(f"{k}={v}" for k, v in knobs.items()), knobs)


if __name__ == "__main__":
    sys.exit(main())
