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


def time_test_device(fn: Callable, *args, iters: int = 8) -> float:
    """Median on-device seconds per execution, measured from a profiler
    trace (exact executable durations from the TPU timeline).

    The only reliable microbenchmark on remote-dispatch runtimes: wall-clock
    includes ~25 ms dispatch, pipelined timing is coalesced, and in-graph
    repetition gets memoized — the trace records what the chip actually ran.
    Inputs are perturbed per call to defeat server-side memoization.
    """
    import glob
    import shutil
    import tempfile

    import jax.numpy as jnp

    def _bench_target(*a):
        return fn(*a)

    f = jax.jit(_bench_target)
    jax.block_until_ready(f(*args))  # compile outside the trace

    tmp = tempfile.mkdtemp(prefix="ts_bench_trace_")
    try:
        jax.profiler.start_trace(tmp)
        for i in range(iters):
            first = args[0] + jnp.asarray(i, args[0].dtype) * 1e-6
            jax.block_until_ready(f(first, *args[1:]))
        jax.profiler.stop_trace()

        try:
            from tensorflow.tsl.profiler.protobuf import xplane_pb2
        except ImportError:  # pragma: no cover
            from tensorflow.core.profiler.protobuf import xplane_pb2

        files = glob.glob(f"{tmp}/plugins/profile/*/*.xplane.pb")
        durations = []
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(files[0], "rb").read())
        for p in xs.planes:
            if "TPU" not in p.name:
                continue
            for line in p.lines:
                for ev in line.events:
                    md = p.event_metadata[ev.metadata_id]
                    if md.name.startswith("jit__bench_target"):
                        durations.append(ev.duration_ps / 1e12)
        if not durations:
            return float("nan")
        durations.sort()
        return durations[len(durations) // 2]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
