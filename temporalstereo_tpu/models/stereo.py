"""TemporalStereo network: backbone + cascade + temporal state machine.

TPU-native re-design of the per-frame forward and temporal orchestration of
``projects/TemporalStereo/TemporalStereo.py``:
  * forward (:282-324): backbone -> update_map -> aggregation
  * update_map (:326-461): pose-based reprojection of the previous frame's
    cost memory and local disparity map into the current camera, forward
    softmax-splatting along the rigid flow
  * the recurrent state contract of multi_frame_forward (:250-280) /
    video_inference.py — here a static-shape ``PrevInfo`` pytree so the whole
    temporal loop can live inside one jitted graph / ``lax.scan``.

Local-map growth (TemporalStereo.py:367-372): the reference grows the map
1 -> LOCAL_MAP_SIZE channels over the first frames.  Matched EXACTLY with
static shapes: the map starts at 0 channels and each ``update_prev_info``
call emits ``min(in_channels + 1, LOCAL_MAP_SIZE)`` channels — every growth
stage is its own statically-shaped compiled step (the temporal loop unrolls
them, models/temporal.py), after which the shape is stable and scannable.
A full-width map additionally supports the legacy ``local_map_valid``
duplicate-fill gating for shape-stable streaming loops that skip the growth
unroll (bench fast path).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.softsplat import softsplat
from ..ops.warp import project_to_3d
from .aggregation import CostMemory, TemporalStereoAggregation
from .backbone import TemporalStereoBackbone

EXPMAX = 50.0  # metric clamp before exp() (reference TemporalStereo.py:5)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PrevInfo:
    """Recurrent state carried frame-to-frame (the reference's prev_info
    dict: memories, cost_memory, prev_disp, local_map)."""
    memories: Tuple[jnp.ndarray, ...]
    has_memory: jnp.ndarray           # scalar bool
    cost_memory: CostMemory
    prev_disp: jnp.ndarray            # [B, H, W, 1] full-res
    local_map: jnp.ndarray            # [B, H8, W8, S] (S may be 0)
    local_map_valid: jnp.ndarray      # scalar bool


class TemporalStereoNet(nn.Module):
    """Per-frame network (reference forward, TemporalStereo.py:282-324).

    __call__(left_image, right_image, prev, train) -> (outputs dict, PrevInfo)
    ``prev`` must already be warped into the current camera via
    ``update_prev_info`` (the parameter-free reprojection step).
    """
    backbone_cfg: Dict[str, Any]
    coarse_cfg: Dict[str, Any]
    fine_cfg: Dict[str, Any]
    precise_cfg: Dict[str, Any]
    with_previous: bool = False
    use_past_cost: bool = False
    local_map_size: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, left_image: jnp.ndarray, right_image: jnp.ndarray,
                 prev: Optional[PrevInfo] = None, train: bool = False):
        b, full_h, full_w, _ = left_image.shape

        memories = prev.memories if prev is not None else None
        has_memory = prev.has_memory if prev is not None else None
        l_fms, r_fms, new_memories = TemporalStereoBackbone(
            **self.backbone_cfg, dtype=self.dtype, name="backbone")(
            left_image, right_image, memories, has_memory, train)

        cost_memory = None
        local_map = None
        if prev is not None and self.use_past_cost:
            cost_memory = prev.cost_memory
        if (prev is not None and self.local_map_size > 0
                and prev.local_map.shape[-1] > 0):
            if prev.local_map.shape[-1] < self.local_map_size:
                # growth stage: every carried channel is real
                local_map = prev.local_map
            else:
                g = prev.local_map_valid.astype(prev.local_map.dtype)
                local_map = prev.local_map * g

        (disps, costs, samples, offs, search_ranges, new_cost_memory,
         full_disp) = TemporalStereoAggregation(
            self.coarse_cfg, self.fine_cfg, self.precise_cfg,
            dtype=self.dtype, name="aggregation")(
            l_fms, r_fms, left_image, right_image, cost_memory, local_map,
            train)

        # all scales to full resolution with width-ratio value scaling
        # (reference :305-309)
        full_disps = []
        for d in disps:
            dw = d.shape[2]
            full_disps.append(
                resize_bilinear(d * (full_w / dw), (full_h, full_w)))

        outputs = {
            "disps": full_disps,
            "costs": costs,
            "offsets": offs,
            "disp_samples": samples,
            "search_ranges": search_ranges,
            "left_feats": l_fms,
            "right_feats": r_fms,
        }
        if local_map is not None:
            # the warped local-map hypotheses actually consumed this frame
            # (reference outputs[('local_map', 0, 'l')], :302-303)
            outputs["local_map"] = local_map

        if prev is not None:
            # geometry state stays f32: disparities up to MAX_DISP have a
            # 1-px ULP in bf16, which would wreck the temporal hypotheses.
            # Backbone activation memories keep the compute dtype.
            new_prev = PrevInfo(
                memories=new_memories,
                has_memory=jnp.ones((), jnp.bool_),
                cost_memory=CostMemory(
                    disp_sample=new_cost_memory.disp_sample.astype(
                        jnp.float32),
                    cost_volume=new_cost_memory.cost_volume.astype(
                        jnp.float32),
                    valid=new_cost_memory.valid,
                ),
                prev_disp=jax.lax.stop_gradient(full_disp).astype(
                    jnp.float32),
                local_map=prev.local_map.astype(jnp.float32),
                local_map_valid=prev.local_map_valid,
            )
        else:
            new_prev = None
        return outputs, new_prev


# --------------------------------------------------------------------------
# Parameter-free temporal reprojection (reference update_map, :326-461)
# --------------------------------------------------------------------------

def _downscale_K(K: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Scale the first two intrinsic rows by 1/factor (:347-351)."""
    return jnp.concatenate(
        [K[:, 0:1, :] / factor, K[:, 1:2, :] / factor, K[:, 2:, :]], axis=1)


def _splat_metric(prev_disp: jnp.ndarray) -> jnp.ndarray:
    """Importance metric: disparity minus its global mean, clamped
    (:364, :380, :418 — nearer pixels win occlusion contests)."""
    return jnp.clip(prev_disp - jnp.mean(prev_disp), -EXPMAX, EXPMAX)


def update_prev_info(prev: PrevInfo, K: jnp.ndarray, baseline: jnp.ndarray,
                     T_past_to_now: jnp.ndarray, full_size: Tuple[int, int],
                     use_past_cost: bool, local_map_size: int,
                     splat_method: str = "einsum") -> PrevInfo:
    """Warp the carried temporal state into the current camera.

    K: [B, 3, 3] full-resolution intrinsics; baseline: [B]; T_past_to_now:
    [B, 4, 4].  Pure function of arrays — no parameters — so it sits outside
    the flax module, exactly between backbone and aggregation as in the
    reference forward (:292-293).
    """
    if not use_past_cost and local_map_size <= 0:
        return prev

    full_h, full_w = full_size
    bl = baseline.reshape(-1, 1, 1, 1).astype(prev.prev_disp.dtype)

    # Both carried states live at the same 1/8 grid and share the camera,
    # rigid flow, and splat metric (both derive from prev_disp; the softmax
    # splat normalizes per-pixel with the same weights) — so the whole update
    # is ONE stacked reprojection and ONE fused splat, instead of the
    # reference's two update_past_cost/update_local_map passes (:340-426).
    if use_past_cost:
        ms = jax.lax.stop_gradient(prev.cost_memory.disp_sample)
        mv = jax.lax.stop_gradient(prev.cost_memory.cost_volume)
        h, w = ms.shape[1:3]
        k = ms.shape[-1]
    else:
        ms = mv = None
        h, w = prev.local_map.shape[1:3]
        k = 0

    factor = full_w / w
    down_K = _downscale_K(K, factor)
    down_inv_K = jnp.linalg.inv(down_K)
    focal = down_K[:, 0, 0].reshape(-1, 1, 1, 1)

    pd = resize_bilinear(prev.prev_disp * (w / full_w), (h, w))

    lm = None
    if local_map_size > 0:
        # ring update, newest disparity in channel 0, truncated to
        # LOCAL_MAP_SIZE (reference :367-372).  With in_channels <
        # LOCAL_MAP_SIZE this IS the reference's growth schedule (first fill
        # = the reprojected previous disparity alone, then +1 channel per
        # frame) — exact, statically shaped per growth stage.
        stacked = jnp.concatenate(
            [pd, prev.local_map], axis=-1)[..., :local_map_size]
        if prev.local_map.shape[-1] >= local_map_size:
            # legacy shape-stable path: before first fill, every channel
            # takes the previous disparity (duplicate-fill), gated by
            # local_map_valid — used by streaming loops that skip the
            # growth unroll
            filled = jnp.broadcast_to(pd, stacked.shape)
            lm = jnp.where(prev.local_map_valid, stacked, filled)
        else:
            lm = stacked

    # channel 0 = pd itself: its reprojection yields the rigid flow, the rest
    # of the stack rides along in the same project_to_3d call.
    disp_stack = jnp.concatenate(
        [pd] + ([ms] if ms is not None else [])
        + ([lm] if lm is not None else []), axis=-1)
    depth_stack = bl * focal / (disp_stack + 1e-5)
    outs = project_to_3d(depth_stack, down_K, down_inv_K, T_past_to_now)
    flow = outs["optical_flow"][:, :, :, 0, :]             # [B, h, w, 2]
    updated = bl * focal / (outs["triangular_depth"] + 1e-5)

    splat_in = []
    if use_past_cost:
        splat_in += [updated[..., 1:1 + k], mv]
    if local_map_size > 0:
        splat_in.append(updated[..., 1 + k:])
    warped = softsplat(jnp.concatenate(splat_in, axis=-1), flow,
                       _splat_metric(pd), mode="softmax",
                       method=splat_method)
    warped = jax.lax.stop_gradient(warped)

    new_cost_memory = prev.cost_memory
    if use_past_cost:
        new_cost_memory = CostMemory(
            disp_sample=warped[..., :k],
            cost_volume=warped[..., k:2 * k],
            valid=prev.cost_memory.valid,
        )

    new_local_map = prev.local_map
    new_local_valid = prev.local_map_valid
    if local_map_size > 0:
        new_local_map = warped[..., 2 * k:]
        new_local_valid = jnp.ones((), jnp.bool_)

    return PrevInfo(
        memories=prev.memories,
        has_memory=prev.has_memory,
        cost_memory=new_cost_memory,
        prev_disp=prev.prev_disp,
        local_map=new_local_map,
        local_map_valid=new_local_valid,
    )


def init_prev_info(model: TemporalStereoNet, batch_size: int,
                   full_size: Tuple[int, int],
                   memory_shapes: Tuple[Tuple[int, ...], ...],
                   topk: int, dtype=None,
                   local_map_channels: Optional[int] = None) -> PrevInfo:
    """Zero-state PrevInfo with static shapes for the temporal loop.

    ``dtype`` is the activation/compute dtype (backbone memories); the
    geometry state (disparities, cost memory, local map) is always f32 —
    bf16's 1-px ULP at MAX_DISP would corrupt temporal hypotheses.

    ``local_map_channels``: 0 starts the EXACT reference growth schedule
    (each warp adds one channel up to LOCAL_MAP_SIZE — the temporal loop
    unrolls those shape-changing steps); None/size keeps the legacy
    full-width map with ``local_map_valid`` duplicate-fill gating
    (shape-stable from frame 0, for streaming loops with one compiled step).
    """
    dtype = dtype or model.dtype or jnp.float32
    full_h, full_w = full_size
    h8, w8 = full_h // 8, full_w // 8
    if local_map_channels is None:
        local_map_channels = max(model.local_map_size, 1)
    # memories live on the concatenated [left; right] batch (2B) — the trunk
    # processes both views in one pass (backbone/TemporalStereo.py:150-160)
    memories = tuple(jnp.zeros((2 * batch_size, *s), dtype)
                     for s in memory_shapes)
    return PrevInfo(
        memories=memories,
        has_memory=jnp.zeros((), jnp.bool_),
        cost_memory=CostMemory.zeros(batch_size, h8, w8, topk, jnp.float32),
        prev_disp=jnp.zeros((batch_size, full_h, full_w, 1), jnp.float32),
        local_map=jnp.zeros(
            (batch_size, h8, w8, local_map_channels), jnp.float32),
        local_map_valid=jnp.zeros((), jnp.bool_),
    )


def backbone_memory_shapes(backbone_cfg: Dict[str, Any],
                           full_size: Tuple[int, int]) -> Tuple[Tuple[int, ...], ...]:
    """Static (h, w, mc) shapes of the backbone channel memories for a given
    input size, derived from the stage spec without tracing."""
    from .backbone import V2S_GROUPS

    mp = backbone_cfg.get("memory_percent", 0.0)
    groups = backbone_cfg.get("groups", V2S_GROUPS)
    full_h, full_w = full_size
    shapes = []
    if mp <= 0:
        return tuple()
    stride = 2  # stem
    ch = None
    for group in groups:
        for spec in group:
            for r in range(spec.repeats):
                s = spec.stride if r == 0 else 1
                stride *= s
                in_ch = ch if ch is not None else 24
                if (spec.block_type == "ir" and s == 1
                        and in_ch == spec.channels):
                    mc = int(in_ch * mp)
                    shapes.append((full_h // stride, full_w // stride, mc))
                ch = spec.channels
    return tuple(shapes)
