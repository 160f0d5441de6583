"""Parity tests: interpolation ops vs torch (CPU) align-corners semantics."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from temporalstereo_tpu.ops import (
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    avg_pool3d,
    max_pool3d,
    resize_bilinear,
    resize_trilinear,
)


def test_resize_bilinear_matches_torch_align_corners(rng):
    x = rng.randn(2, 9, 13, 4).astype(np.float32)
    for size in [(18, 26), (5, 7), (9, 13), (1, 13), (27, 39)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
            mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_resize_trilinear_matches_torch(rng):
    x = rng.randn(2, 4, 6, 8, 3).astype(np.float32)
    for size in [(8, 12, 16), (2, 3, 4), (4, 6, 8)]:
        ours = np.asarray(resize_trilinear(jnp.asarray(x), size))
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3), size=size,
            mode="trilinear", align_corners=True
        ).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_pool3d_matches_torch(rng):
    x = rng.randn(2, 6, 10, 12, 3).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ours = np.asarray(avg_pool3d(jnp.asarray(x), (1, 2, 2), (1, 2, 2)))
    theirs = F.avg_pool3d(xt, (1, 2, 2), (1, 2, 2)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    ours = np.asarray(avg_pool3d(jnp.asarray(x), (5, 5, 5), (1, 1, 1), (2, 2, 2)))
    theirs = F.avg_pool3d(xt, 5, 1, 2, count_include_pad=True)
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    ours = np.asarray(max_pool3d(jnp.asarray(x), (5, 5, 5), (1, 1, 1), (2, 2, 2)))
    theirs = F.max_pool3d(xt, 5, 1, 2).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_adaptive_pools_match_torch(rng):
    x = rng.randn(2, 16, 24, 1).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (4, 6)))
    theirs = F.adaptive_avg_pool2d(xt, (4, 6)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    ours = np.asarray(adaptive_max_pool2d(jnp.asarray(x), (4, 6)))
    theirs = F.adaptive_max_pool2d(xt, (4, 6)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
