"""Microbenchmark harness.

Re-design of reference ``architecture/utils/time_test_template.py``
(timeTestTemplate :4-43): the CUDA-event timing template becomes a
block_until_ready wall-clock loop with jit warmup — the same role the
reference's op ``__main__`` benchmarks play (SURVEY §4.1), promoted to a
first-class utility since frames/s/chip is the north-star metric.
"""
from __future__ import annotations

import time
from typing import Callable

import jax


def time_test(fn: Callable, *args, iters: int = 100, warmup: int = 3,
              jit: bool = True, **kwargs) -> float:
    """Median seconds per call of ``fn(*args)`` on-device.

    Each call blocks on its result: honest per-execution latency including
    dispatch (pipelined timing over-reports on remote-tunnel runtimes that
    coalesce identical executions)."""
    f = jax.jit(fn, **kwargs) if jit else fn
    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_test_fused(fn: Callable, *args, reps: int = 32, iters: int = 5,
                    warmup: int = 1) -> float:
    """Median seconds per op execution with ``reps`` executions fused into one
    dispatch (for microbenchmarks on remote-dispatch runtimes where per-call
    latency swamps small kernels).

    The op input is perturbed per repetition (loop-carried dependency), so
    XLA cannot hoist or elide executions.
    """
    import jax.numpy as jnp

    first = args[0]
    rest = args[1:]

    @jax.jit
    def run(first, *rest):
        def body(i, carry):
            acc, x = carry
            out = fn(x, *rest)
            # loop-carried dependence: next input depends on this output
            # (value change is below f32 resolution, but XLA cannot elide
            # the ordering since the scalar is runtime-computed)
            s = jnp.max(jnp.abs(out.astype(jnp.float32))) * jnp.float32(1e-20)
            return acc + s, x + s.astype(x.dtype)
        acc, _ = jax.lax.fori_loop(0, reps, body,
                                   (jnp.float32(0.0), first))
        return acc

    for _ in range(warmup):
        jax.block_until_ready(run(first, *rest))
    times = []
    # distinct outer inputs per timed call: remote runtimes memoize
    # identical (executable, args) executions
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(first + jnp.float32(i) * 1e-6, *rest))
        times.append(time.perf_counter() - t0)
    times.sort()
    base = times[len(times) // 2]
    return base / reps


# reference-compatible alias (time_test_template.py:4)
timeTestTemplate = time_test


def report(name: str, seconds: float) -> str:
    msg = (f"{name} forward once takes {seconds * 1000:.4f}ms, "
           f"i.e. {1.0 / seconds:.2f}fps")
    print(msg, flush=True)
    return msg
