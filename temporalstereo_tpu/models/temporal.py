"""Multi-frame temporal forward: the reference's frame loop as a lax.scan.

Re-design of ``multi_frame_forward`` (projects/TemporalStereo/
TemporalStereo.py:250-280) and the streaming mode of video_inference.py:
  * frames processed in ascending timestamp order, carrying PrevInfo
  * by default past frames run with stop_gradient in eval mode (BN running
    stats), only the final frame contributes loss (:260-274,
    PREVIOUS_WITH_GRADIENT=False) — so the scan carries O(1) state and no
    BPTT memory blow-up
  * pose chaining: T_past_to_now[t] = T[t] @ inv_T[t-1] (:335-338)

Batch layout (time-major pytree):
  left/right:  [T, B, H, W, 3]
  T_cam/inv_T: [T, B, 4, 4]  (world->cam and inverse)
  K:           [B, 3, 3] full-res intrinsics; baseline: [B]
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .stereo import (
    PrevInfo,
    TemporalStereoNet,
    backbone_memory_shapes,
    init_prev_info,
    update_prev_info,
)


def chained_poses(T_cam: jnp.ndarray, inv_T: jnp.ndarray) -> jnp.ndarray:
    """[T, B, 4, 4] world->cam poses -> per-step T_past_to_now (identity for
    the first frame)."""
    t = T_cam.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=T_cam.dtype), T_cam.shape[1:])
    if t == 1:
        return eye[None]
    rel = jnp.einsum("tbij,tbjk->tbik", T_cam[1:], inv_T[:-1])
    return jnp.concatenate([eye[None], rel], axis=0)


def _maybe_warp(model: TemporalStereoNet, prev: PrevInfo, K, baseline,
                T_p2n, full_size, splat_method: str) -> PrevInfo:
    """Warp carried state into the current camera, but only once real state
    exists (reference gates on (t-1) in frame_idxs, :292-299)."""
    return jax.lax.cond(
        prev.has_memory,
        lambda p: update_prev_info(p, K, baseline, T_p2n, full_size,
                                   model.use_past_cost, model.local_map_size,
                                   splat_method),
        lambda p: p,
        prev)


def multi_frame_forward(model: TemporalStereoNet, variables: Dict,
                        batch: Dict[str, jnp.ndarray], train: bool = False,
                        previous_with_gradient: bool = False,
                        splat_method: str = "einsum",
                        mutable: Tuple[str, ...] = (),
                        remat: bool = False):
    """Run the temporal window; return (outputs of final frame, new_variables,
    final PrevInfo).

    ``new_variables`` is the (possibly updated) variable dict when ``mutable``
    includes 'batch_stats' and train=True, else ``variables`` unchanged.
    ``remat`` (cfg TPU.REMAT) wraps each per-frame forward in
    ``jax.checkpoint`` so the backward pass recomputes per-frame activations
    instead of holding them — the memory lever for long windows
    (FRAME_IDXS=[-10..0], reference configs/kitti2015-multi.yaml).

    Local-map growth is EXACT (reference update_local_map grows the map
    1 -> LOCAL_MAP_SIZE channels, TemporalStereo.py:367-372): the first
    ``LOCAL_MAP_SIZE + 1`` frames change the carried shape, so they run as
    statically-shaped unrolled steps; the remaining past frames run in one
    ``lax.scan`` over the stable shape.
    """
    left, right = batch["left"], batch["right"]
    t, b, full_h, full_w, _ = left.shape
    full_size = (full_h, full_w)

    if not model.with_previous:
        return _apply(model, variables, left[-1], right[-1], None, train,
                      mutable)

    K = batch["K"]
    baseline = batch["baseline"]
    t_p2n = chained_poses(batch["T_cam"], batch["inv_T"])

    mem_shapes = backbone_memory_shapes(model.backbone_cfg, full_size)
    topk = model.precise_cfg.get("topk", 2)
    # carried state takes the model's compute dtype (bf16 under the mixed-
    # precision policy) so the scan carry is type-stable
    dtype = model.dtype or left.dtype
    prev0 = init_prev_info(model, b, full_size, mem_shapes, topk, dtype,
                           local_map_channels=0 if model.local_map_size > 0
                           else None)
    # frames whose warp still grows the local map (shape-changing) + frame 0
    # (no warp) must be unrolled; everything after is shape-stable
    n_grow = (model.local_map_size + 1) if model.local_map_size > 0 else 1

    def warp(prev, i):
        return update_prev_info(prev, K, baseline, t_p2n[i], full_size,
                                model.use_past_cost, model.local_map_size,
                                splat_method)

    if previous_with_gradient:
        # unrolled, all frames in train mode with gradients (reference
        # :260-263); losses over every frame are the caller's business
        prev = prev0
        all_outputs = []
        for i in range(t):
            if i > 0:
                prev = warp(prev, i)
            outputs, variables, prev = _apply(
                model, variables, left[i], right[i], prev, train, mutable,
                remat)
            all_outputs.append(outputs)
        return all_outputs, variables, prev

    # past frames: eval mode, stop-gradient carry
    prev = prev0
    n_unrolled_past = min(n_grow, t - 1)
    for i in range(n_unrolled_past):
        def past_step(prev, li, ri, i=i):
            p = warp(prev, i) if i > 0 else prev
            _, new_prev = model.apply(variables, li, ri, p, False)
            return jax.lax.stop_gradient(new_prev)

        if remat:
            past_step = jax.checkpoint(past_step)
        prev = past_step(prev, left[i], right[i])

    if t - 1 > n_unrolled_past:
        def frame_step(prev, inputs):
            li, ri, tp = inputs
            p = update_prev_info(prev, K, baseline, tp, full_size,
                                 model.use_past_cost, model.local_map_size,
                                 splat_method)
            _, new_prev = model.apply(variables, li, ri, p, False)
            return jax.lax.stop_gradient(new_prev), None

        if remat:
            # no gradient flows through past frames, but without remat XLA
            # still buffers every scan iteration's intermediates for the
            # (dead) backward; checkpoint keeps the window O(1) in t
            frame_step = jax.checkpoint(frame_step)
        prev, _ = jax.lax.scan(
            frame_step, prev,
            (left[n_unrolled_past:-1], right[n_unrolled_past:-1],
             t_p2n[n_unrolled_past:-1]))

    if t > 1:
        prev = warp(prev, t - 1)
    # the final (loss-bearing) frame is NOT checkpointed: backprop through one
    # frame needs its activations either way, a whole-forward checkpoint here
    # would only add a redundant recompute
    return _apply(model, variables, left[-1], right[-1], prev, train, mutable)


def _apply(model, variables, left, right, prev, train, mutable,
           remat: bool = False):
    if train and mutable:
        def fwd(variables, left, right, prev):
            return model.apply(variables, left, right, prev, True,
                               mutable=list(mutable))

        if remat:
            # per-frame checkpoint for BPTT (previous_with_gradient): store
            # only frame inputs/carries, recompute activations in backward
            fwd = jax.checkpoint(fwd)
        (outputs, new_prev), updates = fwd(variables, left, right, prev)
        new_vars = {**variables, **updates}
        return outputs, new_vars, new_prev
    outputs, new_prev = model.apply(variables, left, right, prev, train)
    return outputs, variables, new_prev


def streaming_step(model: TemporalStereoNet, variables: Dict,
                   left: jnp.ndarray, right: jnp.ndarray,
                   prev: Optional[PrevInfo], K: jnp.ndarray,
                   baseline: jnp.ndarray, T_past_to_now: jnp.ndarray,
                   splat_method: str = "einsum",
                   warp: Optional[bool] = None):
    """Online single-frame step reusing carried state — the video mode
    (video_inference.py:253-301). Returns (outputs, new_prev).

    ``warp``: None picks at runtime via ``prev.has_memory`` (requires a
    shape-stable full-width local map — the legacy duplicate-fill mode);
    True/False decides statically, which is required during the local-map
    GROWTH frames where the warp changes the carried shape (a runtime
    ``lax.cond`` could not: its branches must agree on shapes).
    """
    full_size = left.shape[1:3]
    if prev is not None:
        if warp is None:
            assert (model.local_map_size == 0
                    or prev.local_map.shape[-1] >= model.local_map_size), (
                "runtime warp gating needs a full-width local map; pass "
                "warp=True/False statically during growth frames")
            prev = _maybe_warp(model, prev, K, baseline, T_past_to_now,
                               full_size, splat_method)
        elif warp:
            prev = update_prev_info(prev, K, baseline, T_past_to_now,
                                    full_size, model.use_past_cost,
                                    model.local_map_size, splat_method)
    outputs, new_prev = model.apply(variables, left, right, prev, False)
    return outputs, new_prev
