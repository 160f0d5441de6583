"""Unit tests for the fused temporal state reprojection (update_prev_info).

The fused implementation stacks the cost-memory hypotheses and the local map
into one project_to_3d call and one softmax splat (they share camera, rigid
flow and splat metric).  These tests pin that down:
  * identity pose => zero flow => the warped state equals the input state
  * fused result == a straightforward unfused oracle under a nontrivial pose
    (the oracle mirrors the reference's separate update_past_cost /
    update_local_map passes, TemporalStereo.py:340-426)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalstereo_tpu.models.aggregation import CostMemory
from temporalstereo_tpu.models.stereo import (
    PrevInfo,
    _downscale_K,
    _splat_metric,
    update_prev_info,
)
from temporalstereo_tpu.ops.interpolate import resize_bilinear
from temporalstereo_tpu.ops.softsplat import softsplat
from temporalstereo_tpu.ops.warp import project_to_3d


def _make_prev(rng, b=1, full_h=32, full_w=64, k=2, s=3):
    h, w = full_h // 8, full_w // 8
    mem = ()
    disp = 3.0 + 10.0 * rng.rand(b, full_h, full_w, 1).astype(np.float32)
    return PrevInfo(
        memories=mem,
        has_memory=jnp.ones((), jnp.bool_),
        cost_memory=CostMemory(
            disp_sample=jnp.asarray(
                1.0 + 5.0 * rng.rand(b, h, w, k).astype(np.float32)),
            cost_volume=jnp.asarray(
                rng.randn(b, h, w, k).astype(np.float32)),
            valid=jnp.ones((), jnp.bool_),
        ),
        prev_disp=jnp.asarray(disp),
        local_map=jnp.asarray(
            1.0 + 5.0 * rng.rand(b, h, w, s).astype(np.float32)),
        local_map_valid=jnp.ones((), jnp.bool_),
    )


def _cam(b=1, full_w=64, full_h=32):
    K = np.array([[40.0, 0, full_w / 2],
                  [0, 40.0, full_h / 2],
                  [0, 0, 1.0]], np.float32)
    return jnp.asarray(np.tile(K, (b, 1, 1))), jnp.full((b,), 0.5, jnp.float32)


def test_identity_pose_preserves_state(rng):
    full_h, full_w = 32, 64
    prev = _make_prev(rng, full_h=full_h, full_w=full_w)
    K, baseline = _cam(full_h=full_h, full_w=full_w)
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)))

    out = update_prev_info(prev, K, baseline, T, (full_h, full_w),
                           use_past_cost=True, local_map_size=3)

    np.testing.assert_allclose(out.cost_memory.disp_sample,
                               prev.cost_memory.disp_sample,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out.cost_memory.cost_volume,
                               prev.cost_memory.cost_volume,
                               rtol=1e-3, atol=1e-3)
    # local map ring update: channel 0 becomes the (downscaled) prev_disp,
    # channels 1..s-1 shift in from the old map
    h, w = prev.local_map.shape[1:3]
    pd = resize_bilinear(prev.prev_disp * (w / full_w), (h, w))
    expect = jnp.concatenate([pd, prev.local_map[..., :2]], axis=-1)
    np.testing.assert_allclose(out.local_map, expect, rtol=1e-3, atol=1e-3)
    assert bool(out.local_map_valid)


def _unfused_oracle(prev, K, baseline, T, full_size, local_map_size):
    """Reference-style two-pass update (the pre-fusion implementation)."""
    full_h, full_w = full_size
    bl = baseline.reshape(-1, 1, 1, 1)

    def flow_and_project(h, w, stack=None):
        factor = full_w / w
        down_K = _downscale_K(K, factor)
        down_inv_K = jnp.linalg.inv(down_K)
        focal = down_K[:, 0, 0].reshape(-1, 1, 1, 1)
        pd = resize_bilinear(prev.prev_disp * (w / full_w), (h, w))
        prev_depth = bl * focal / (pd + 1e-5)
        out = project_to_3d(prev_depth, down_K, down_inv_K, T)
        flow = out["optical_flow"][:, :, :, 0, :]
        res = {"flow": flow, "pd": pd, "focal": focal}
        if stack is not None:
            outs = project_to_3d(bl * focal / (stack + 1e-5), down_K,
                                 down_inv_K, T)
            res["updated"] = bl * focal / (outs["triangular_depth"] + 1e-5)
        return res

    ms, mv = prev.cost_memory.disp_sample, prev.cost_memory.cost_volume
    h, w = ms.shape[1:3]
    proj = flow_and_project(h, w, stack=ms)
    warped = softsplat(jnp.concatenate([proj["updated"], mv], -1),
                       proj["flow"], _splat_metric(proj["pd"]),
                       mode="softmax")
    k = ms.shape[-1]
    cm = CostMemory(disp_sample=warped[..., :k], cost_volume=warped[..., k:],
                    valid=prev.cost_memory.valid)

    s = local_map_size
    proj2 = flow_and_project(h, w)
    pd = proj2["pd"]
    lm = jnp.concatenate([pd, prev.local_map[..., : s - 1]], -1)
    factor = full_w / w
    down_K = _downscale_K(K, factor)
    focal = down_K[:, 0, 0].reshape(-1, 1, 1, 1)
    outs = project_to_3d(bl * focal / (lm + 1e-5), down_K,
                         jnp.linalg.inv(down_K), T)
    updated_lm = bl * focal / (outs["triangular_depth"] + 1e-5)
    warped_lm = softsplat(updated_lm, proj2["flow"], _splat_metric(pd),
                          mode="softmax")
    return cm, warped_lm


@pytest.mark.parametrize("tz", [0.05, -0.08])
def test_fused_matches_unfused_oracle(rng, tz):
    full_h, full_w = 32, 64
    prev = _make_prev(rng, full_h=full_h, full_w=full_w)
    K, baseline = _cam(full_h=full_h, full_w=full_w)
    T_np = np.eye(4, dtype=np.float32)
    T_np[0, 3] = 0.02   # small lateral translation
    T_np[2, 3] = tz     # forward/backward motion
    T = jnp.asarray(T_np[None])

    out = update_prev_info(prev, K, baseline, T, (full_h, full_w),
                           use_past_cost=True, local_map_size=3)
    cm, lm = _unfused_oracle(prev, K, baseline, T, (full_h, full_w), 3)

    np.testing.assert_allclose(out.cost_memory.disp_sample, cm.disp_sample,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.cost_memory.cost_volume, cm.cost_volume,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.local_map, lm, rtol=1e-4, atol=1e-4)
