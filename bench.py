"""End-to-end benchmark: flagship TEMPORAL streaming at KITTI eval size.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline is the flagship mode — temporal streaming (memory-spliced
backbone + pose reprojection + softmax splat + cost memory + local map), the
mode of the reference's video_inference.py / multi_frame_forward
(TemporalStereo.py:250-324) — measured scan-chained: 8 distinct frames per
dispatch with the PrevInfo carry serializing them on-device exactly like
online streaming, without per-dispatch tunnel latency.

Also reported (stderr + JSON extras): single-frame fps and MFU (achieved
TFLOP/s from XLA's compiled cost analysis / chip peak).

Baseline context: the reference paper (TemporalStereo, arXiv 2211.13755)
reports ~24 fps end-to-end on KITTI-size frames on an RTX-class GPU;
vs_baseline = temporal fps / 24.0.
"""
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

BASELINE_FPS = 24.0  # reference end-to-end throughput (paper runtime ~42 ms)
# bf16 compute peak / HBM bandwidth of one chip
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v5p": 459e12,
              "TPU v4": 275e12, "TPU v6 lite": 918e12}
PEAK_HBM_BPS = {"TPU v5 lite": 819e9, "TPU v5e": 819e9, "TPU v5p": 2765e9,
                "TPU v4": 1228e9, "TPU v6 lite": 1640e9}


def _chip_peak(table=PEAK_FLOPS, default=197e12) -> float:
    kind = jax.devices()[0].device_kind
    for k, v in table.items():
        if k in kind:
            return v
    return default


def _median_time(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
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

    cfg = get_cfg(opts=[
        "TRAINER.PRECISION", "bf16",
        "MODEL.WITH_PREVIOUS", "True",
        "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "3",
        "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    model = build_model(cfg)

    b, h, w = 1, 384, 1248
    frames = 8
    rng = np.random.RandomState(0)
    # frames are fed as bf16 (the serving input format): camera data is
    # 8-bit, bf16's 8 significand bits carry it with <=0.2% quantization,
    # and the profiler shows ~0.9 ms/frame of f32->bf16 convert + full-res
    # relayout DMA that this removes (59.0 -> 62.2 fps measured r3)
    left = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
    right = jnp.asarray(rng.rand(b, h, w, 3), jnp.bfloat16)
    K = jnp.asarray(
        np.tile(np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                         np.float32), (b, 1, 1)))
    baseline_m = jnp.full((b,), 0.54, jnp.float32)
    T_np = np.eye(4, dtype=np.float32)
    T_np[0, 3] = 0.02
    T_np[2, 3] = -0.5
    T = jnp.asarray(np.tile(T_np, (b, 1, 1)))

    print("bench: init...", file=sys.stderr, flush=True)
    variables = jax.jit(
        lambda r: model.init({"params": r}, left, right, None, False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    if os.environ.get("TS_FOLD_BN", "") not in ("", "0"):
        # fold eval-mode BN into conv weights (utils/fold_bn): each BN
        # becomes a single add — the op-count/DMA experiment of VERDICT r4.
        # The folded variables carry the 'folded_bn' marker collection that
        # engages the fast path inside nn.layers.Norm.
        from temporalstereo_tpu.utils.fold_bn import fold_batch_norms

        variables, fold_paths = fold_batch_norms(variables)
        print(f"bench: folded {len(fold_paths)} BNs into conv weights",
              file=sys.stderr, flush=True)

    if os.environ.get("TS_BF16_PARAMS", "") not in ("", "0"):
        # store weights as bf16 (serving.cast_params_bf16): halves the
        # weight-fetch bytes behind the profile's 46% weight-DMA share
        from temporalstereo_tpu.serving import cast_params_bf16

        variables = cast_params_bf16(variables)
        print("bench: params cast to bf16 storage", file=sys.stderr,
              flush=True)

    mem_shapes = backbone_memory_shapes(model.backbone_cfg, (h, w))
    prev = init_prev_info(model, b, (h, w), mem_shapes,
                          model.precise_cfg.get("topk", 2), model.dtype)

    lefts = jnp.stack([left + 0.01 * i for i in range(frames)])
    rights = jnp.stack([right + 0.01 * i for i in range(frames)])

    # -------- flagship temporal streaming, scan-chained (the headline) -----
    @jax.jit
    def stream_chunk(lefts, rights, prev):
        def body(p, lr):
            l, r = lr
            outputs, new_p = streaming_step(
                model, variables, l, r, p, K, baseline_m, T)
            return new_p, outputs["disps"][0]
        new_prev, disps = jax.lax.scan(body, prev, (lefts, rights))
        return disps, new_prev

    print("bench: compiling temporal stream...", file=sys.stderr, flush=True)
    lowered = stream_chunk.lower(lefts, rights, prev)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        flops_per_frame = float(cost["flops"]) / frames
        bytes_per_frame = float(cost.get("bytes accessed", float("nan"))
                                ) / frames
    except Exception:
        flops_per_frame = bytes_per_frame = float("nan")

    # marginal per-frame time from two chunk lengths — subtracts the
    # constant per-dispatch tunnel latency (~25-30 ms on this sandbox's
    # remote chip; sub-ms on directly-attached TPUs), i.e. the steady-state
    # streaming throughput of the device itself
    frames2 = 2 * frames
    lefts2 = jnp.concatenate([lefts, lefts + 0.5])
    rights2 = jnp.concatenate([rights, rights + 0.5])
    t_chunk1 = _median_time(stream_chunk, lefts, rights, prev)
    t_chunk2 = _median_time(stream_chunk, lefts2, rights2, prev)
    dt_temporal = max(t_chunk2 - t_chunk1, 1e-9) / (frames2 - frames)
    fps_temporal = b / dt_temporal
    fps_chunked = b * frames / t_chunk1
    achieved = flops_per_frame * b / dt_temporal
    mfu = achieved / _chip_peak()
    hbm_util = (bytes_per_frame * b / dt_temporal
                ) / _chip_peak(PEAK_HBM_BPS, 819e9)

    # -------- single-frame forward (secondary) -----------------------------
    @jax.jit
    def forward_stream(lefts, rights):
        def one(pair):
            l, r = pair
            outputs, _ = model.apply(variables, l, r, None, False)
            return outputs["disps"][0]
        return jax.lax.map(one, (lefts, rights))

    print("bench: compiling single-frame...", file=sys.stderr, flush=True)
    dt_single = _median_time(forward_stream, lefts, rights) / frames
    fps_single = b / dt_single

    print(f"bench: temporal {fps_temporal:.2f} fps steady-state "
          f"({1e3 * dt_temporal:.2f} ms/frame; {fps_chunked:.2f} fps incl. "
          f"per-chunk dispatch), single-frame {fps_single:.2f} fps, "
          f"{achieved / 1e12:.2f} TFLOP/s achieved "
          f"(MFU {100 * mfu:.1f}% of {_chip_peak() / 1e12:.0f} TF peak, "
          f"HBM {100 * hbm_util:.1f}% of peak BW)",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "temporalstereo_streaming_fps_384x1248",
        "value": round(fps_temporal, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_temporal / BASELINE_FPS, 3),
        "chunked_fps": round(fps_chunked, 2),
        "single_frame_fps": round(fps_single, 2),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu": round(mfu, 4),
        "hbm_util": round(hbm_util, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
