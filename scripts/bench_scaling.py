"""Data-parallel weak-scaling benchmark: fixed per-device batch, growing
device count; reports step time and scaling efficiency vs the 1-device run.

North star (BASELINE.json): >=0.9 linear frames/s scaling from 1 chip to N.
On real multi-chip hardware this measures it directly (devices =
jax.devices()).  With a single chip (this environment) run it on the
virtual CPU mesh to validate the *structural* scaling of the SPMD program —
the gradient + BatchNorm-statistic collectives XLA inserts are the same ones
that ride ICI on a pod slice:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py [--full] [--temporal]

The reference has no scaling benchmark at all (its DDP throughput is assumed
from Lightning, SURVEY.md §4); this harness is the TPU-native equivalent of
measuring it.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def tiny_opts(temporal: bool):
    opts = [
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.IN_PLANES", "256",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
        "TRAINER.PRECISION", "f32",
    ]
    if temporal:
        opts += ["MODEL.WITH_PREVIOUS", "True", "MODEL.USE_PAST_COST", "True",
                 "MODEL.LOCAL_MAP_SIZE", "3",
                 "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"]
    return opts


def full_opts(temporal: bool):
    opts = ["TRAINER.PRECISION", "bf16"]
    if temporal:
        opts += ["MODEL.WITH_PREVIOUS", "True", "MODEL.USE_PAST_COST", "True",
                 "MODEL.LOCAL_MAP_SIZE", "3",
                 "MODEL.BACKBONE.MEMORY_PERCENT", "0.5"]
    return opts


def make_batch(rng, t, b, h, w):
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    T_cam = np.tile(np.eye(4, dtype=np.float32), (t, b, 1, 1))
    for i in range(t):
        T_cam[i, :, 2, 3] = -0.1 * i
    return {
        "left": rng.rand(t, b, h, w, 3).astype(np.float32),
        "right": rng.rand(t, b, h, w, 3).astype(np.float32),
        "disp_gt": rng.uniform(1, 30, (t, b, h, w, 1)).astype(np.float32),
        "T_cam": T_cam,
        "inv_T": np.linalg.inv(T_cam),
        "K": np.tile(K, (b, 1, 1)),
        "baseline": np.full((b,), 0.54, np.float32),
    }


def bench_n(n_devices, cfg, model, per_device_batch, t, h, w, iters):
    from temporalstereo_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_batch)
    from temporalstereo_tpu.training import (
        TrainState, build_optimizer, make_train_step)
    import jax.numpy as jnp

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    b = per_device_batch * n_devices
    batch = make_batch(np.random.RandomState(0), t, b, h, w)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["left"][0]),
                           jnp.asarray(batch["right"][0]), None, False)
    tx = build_optimizer(cfg, steps_per_epoch=1000)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = make_sharded_train_step(make_train_step(model, cfg), mesh,
                                   donate=False)
    sharded = shard_batch(mesh, batch)

    state, metrics = step(state, sharded)  # compile
    jax.block_until_ready(metrics["loss"])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(state, sharded)
        jax.block_until_ready(metrics["loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return dt, b / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="flagship model (default: tiny variant — fits CPU)")
    ap.add_argument("--temporal", action="store_true")
    ap.add_argument("--per-device-batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import build_model

    opts = (full_opts if args.full else tiny_opts)(args.temporal)
    cfg = get_cfg(opts=opts)
    model = build_model(cfg, dtype=None)

    n_avail = len(jax.devices())
    ns = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    print(f"devices: {n_avail} x {jax.devices()[0].platform}; "
          f"weak scaling, per-device batch {args.per_device_batch}, "
          f"t={args.frames}, {args.height}x{args.width}", flush=True)

    rows = []
    for n in ns:
        dt, ex_s = bench_n(n, cfg, model, args.per_device_batch, args.frames,
                           args.height, args.width, args.iters)
        rows.append((n, dt, ex_s))
        base = rows[0][2]
        eff = ex_s / (base * n)
        print(f"  n={n:<3d} step {dt * 1e3:8.1f} ms   {ex_s:8.2f} ex/s   "
              f"efficiency {eff:5.2f}", flush=True)

    base = rows[0][2]
    eff = rows[-1][2] / (base * rows[-1][0])
    platform = jax.devices()[0].platform
    if platform == "cpu":
        # Virtual devices time-share the host cores, so "efficiency vs
        # linear" measures oversubscription, not the SPMD program.  What the
        # CPU run validates: the sharded step compiles, executes, and total
        # throughput rises with device count (collectives + BN reductions
        # are functional).  Real scaling efficiency needs >1 chip.
        ncores = os.cpu_count() or 1
        print(f"NOTE: cpu virtual mesh on {ncores} cores — structural "
              "validation only; efficiency-vs-linear is bounded by host "
              "cores, not ICI.")
        # the check is "the sharded step compiled and ran at every device
        # count" — reaching this line means it did; throughput comparisons
        # on an oversubscribed host are informational only
        print(json.dumps({
            "metric": "dp_sharded_train_step_structural_check",
            "value": 1.0,
            "unit": f"1->{rows[-1][0]} virtual devices compiled+ran, "
                    f"throughput {base:.2f}->{rows[-1][2]:.2f} ex/s (cpu)",
            "vs_baseline": None,
        }))
    else:
        print(json.dumps({
            "metric": "dp_weak_scaling_efficiency",
            "value": round(eff, 3),
            "unit": f"throughput ratio vs linear, 1->{rows[-1][0]} devices "
                    f"({platform})",
            "vs_baseline": round(eff / 0.9, 3),
        }))


if __name__ == "__main__":
    main()
