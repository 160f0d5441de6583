"""11-frame temporal TRAINING envelope on the real chip.

The reference's long-window mode (configs/kitti2015-multi.yaml,
FRAME_IDXS=[-10..0]) trains with 11 frames per sample: 10 scanned past
frames (eval mode, stop-gradient) + 1 loss-bearing frame.  This script jits
the full train step at that window on one chip and reports step time and
peak HBM, with TPU.REMAT on or off (--no-remat).

Run: python scripts/bench_train_envelope.py [--frames 11] [--batch 2]
     [--height 320] [--width 1216] [--no-remat]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=11)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=1216)
    p.add_argument("--no-remat", action="store_true")
    args = p.parse_args()

    from temporalstereo_tpu.config import get_cfg
    from temporalstereo_tpu.models import build_model
    from temporalstereo_tpu.training import (
        TrainState, build_optimizer, make_train_step)

    cfg = get_cfg(opts=[
        "TRAINER.PRECISION", "bf16",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "3",
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
        "TPU.REMAT", str(not args.no_remat),
    ])
    model = build_model(cfg)

    t, b, h, w = args.frames, args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                 np.float32)
    T_cam = np.tile(np.eye(4, dtype=np.float32), (t, b, 1, 1))
    for i in range(t):
        T_cam[i, :, 2, 3] = -0.5 * i
        T_cam[i, :, 0, 3] = 0.02 * i
    batch = {
        "left": rng.rand(t, b, h, w, 3).astype(np.float32),
        "right": rng.rand(t, b, h, w, 3).astype(np.float32),
        "disp_gt": rng.uniform(1, 60, (t, b, h, w, 1)).astype(np.float32),
        "T_cam": T_cam,
        "inv_T": np.linalg.inv(T_cam),
        "K": np.tile(K, (b, 1, 1)),
        "baseline": np.full((b,), 0.54, np.float32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    print(f"envelope: t={t} b={b} {h}x{w} bf16 "
          f"remat={'off' if args.no_remat else 'on'}; init...", flush=True)
    variables = jax.jit(lambda r: model.init(
        {"params": r}, batch["left"][0], batch["right"][0], None, False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    tx = build_optimizer(cfg, steps_per_epoch=10 ** 6)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    print("envelope: compiling train step (cold: several minutes)...",
          flush=True)
    t0 = time.time()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"envelope: first step (incl. compile) {time.time() - t0:.1f}s, "
          f"loss {float(metrics['loss']):.3f}", flush=True)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
    limit = stats.get("bytes_limit", 0) / 2 ** 30
    print(f"envelope: step {dt:.2f}s ({b / dt:.2f} ex/s, "
          f"{t * b / dt:.1f} frames/s), peak HBM {peak:.2f} GiB"
          + (f" of {limit:.1f} GiB" if limit else ""), flush=True)


if __name__ == "__main__":
    sys.exit(main())
