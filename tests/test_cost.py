"""Tests for cost-volume construction: golden semantics vs a direct numpy
construction of the reference behaviour (block_cost.py:16-83)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from temporalstereo_tpu.ops import (
    block_cost,
    cat_fms,
    dif_fms,
    groupwise_correlation,
    shift_right_features,
)


def test_shift_right_features_semantics(rng):
    """out[:, d, :, x] must be target[:, :, x - d] with zero fill."""
    x = rng.randn(1, 2, 6, 3).astype(np.float32)
    out = np.asarray(shift_right_features(jnp.asarray(x), 4))
    assert out.shape == (1, 4, 2, 6, 3)
    for d in range(4):
        for col in range(6):
            if col - d >= 0:
                np.testing.assert_allclose(out[0, d, :, col], x[0, :, col - d])
            else:
                np.testing.assert_allclose(out[0, d, :, col], 0.0)


def test_groupwise_correlation(rng):
    a = rng.randn(1, 2, 3, 4, 16).astype(np.float32)
    b = rng.randn(1, 2, 3, 4, 16).astype(np.float32)
    out = np.asarray(groupwise_correlation(jnp.asarray(a), jnp.asarray(b)))
    ref = -((a - b) ** 2).reshape(1, 2, 3, 4, 2, 8).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def _torch_block_cost_int(left, right, max_disp, scale):
    """Direct torch construction of the reference int path for parity."""
    l = torch.from_numpy(left).permute(0, 3, 1, 2)
    r = torch.from_numpy(right).permute(0, 3, 1, 2)
    B, C, H, W = l.shape
    padded = F.pad(r, (max_disp - 1, 0, 0, 0))
    unfolded = F.unfold(padded, kernel_size=(1, max_disp)).reshape(
        B, C, max_disp, H, W)
    tgt = torch.flip(unfolded, dims=[2])
    ref = l.reshape(B, C, 1, H, W).repeat(1, 1, max_disp, 1, 1)
    cost = -(ref - tgt) ** 2
    costs = [cost]
    for s in range(scale):
        sH, sW = min(2 ** s, H), min(2 ** s, W)
        lr = F.avg_pool3d(ref, (1, sH, sW), (1, sH, sW))
        lt = F.avg_pool3d(tgt, (1, sH, sW), (1, sH, sW))
        g = C // 8
        corr = -((lr - lt) ** 2).reshape(B, g, 8, *lr.shape[2:]).sum(2)
        corr = F.interpolate(corr, size=(max_disp, H, W), mode="trilinear",
                             align_corners=True)
        costs.append(corr)
    return torch.cat(costs, dim=1).permute(0, 2, 3, 4, 1).numpy()


def test_block_cost_int_path_matches_reference_semantics(rng):
    left = rng.randn(1, 8, 12, 16).astype(np.float32)
    right = rng.randn(1, 8, 12, 16).astype(np.float32)
    ours = np.asarray(block_cost(jnp.asarray(left), jnp.asarray(right), 4,
                                 block_cost_scale=3))
    theirs = _torch_block_cost_int(left, right, 4, 3)
    # int path: base difference cost keeps C channels (block_cost.py:45)
    assert ours.shape == theirs.shape == (1, 4, 8, 12, 16 + 3 * 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_block_cost_tensor_path_shapes_and_zero_disp(rng):
    """With all-zero disparity samples the warped target equals the target and
    the concat cost must be exactly [ref, target]."""
    left = rng.randn(1, 6, 10, 16).astype(np.float32)
    right = rng.randn(1, 6, 10, 16).astype(np.float32)
    disp = np.zeros((1, 3, 6, 10), dtype=np.float32)
    out = np.asarray(block_cost(jnp.asarray(left), jnp.asarray(right),
                                jnp.asarray(disp), block_cost_scale=2))
    c = 16
    assert out.shape == (1, 3, 6, 10, 2 * c + 2 * c // 8)
    np.testing.assert_allclose(out[0, 0, :, :, :c], left[0], atol=1e-5)
    np.testing.assert_allclose(out[0, 1, :, :, c:2 * c], right[0], atol=1e-5)


def test_cat_and_dif_fms(rng):
    left = rng.randn(1, 4, 6, 8).astype(np.float32)
    right = rng.randn(1, 4, 6, 8).astype(np.float32)
    disp = np.broadcast_to(
        np.array([0.0, 1.0], np.float32).reshape(1, 2, 1, 1), (1, 2, 4, 6)
    ).copy()
    cat = np.asarray(cat_fms(jnp.asarray(left), jnp.asarray(right),
                             jnp.asarray(disp)))
    # disp=1 -> target sampled at x-1
    np.testing.assert_allclose(cat[0, 1, :, 1:, 8:], right[0, :, :-1],
                               atol=1e-5)
    dif = np.asarray(dif_fms(jnp.asarray(left), jnp.asarray(right),
                             jnp.asarray(disp)))
    # reference fill rule (dif_fms.py:36-41): positions whose WARPED target
    # value is <= 0 take the volume max cost — at disp=0 that is right<=0
    expect0 = np.where(right[0] > 0, np.abs(left - right)[0], dif.max())
    np.testing.assert_allclose(dif[0, 0], expect0, atol=1e-5)
    # out-of-view column (x=0 at disp=1) pads to zero -> max cost
    assert np.allclose(dif[0, 1, :, 0, :], dif.max())


def test_cat_dif_fms_int_fast_path(rng):
    """int D must equal the tensor path with broadcast integer samples."""
    left = rng.randn(1, 4, 10, 8).astype(np.float32)
    right = rng.randn(1, 4, 10, 8).astype(np.float32)
    disp = np.broadcast_to(
        np.arange(3, dtype=np.float32)[None, :, None, None], (1, 3, 4, 10)
    ).copy()
    a = np.asarray(cat_fms(jnp.asarray(left), jnp.asarray(right), 3))
    b = np.asarray(cat_fms(jnp.asarray(left), jnp.asarray(right),
                           jnp.asarray(disp)))
    np.testing.assert_allclose(a, b, atol=1e-5)
    a = np.asarray(dif_fms(jnp.asarray(left), jnp.asarray(right), 3))
    b = np.asarray(dif_fms(jnp.asarray(left), jnp.asarray(right),
                           jnp.asarray(disp)))
    np.testing.assert_allclose(a, b, atol=1e-5)
