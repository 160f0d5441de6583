"""Parity tests: warping ops vs torch grid_sample (align_corners=True)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from temporalstereo_tpu.ops import (
    grid_sample,
    inverse_warp,
    inverse_warp_3d,
    mesh_grid,
    project_to_3d,
    shift_1d,
)


def _torch_grid_sample(img_nhwc, coords_xy, padding_mode):
    """Sample with torch in normalized coords for comparison."""
    b, h, w, c = img_nhwc.shape
    x = coords_xy[..., 0]
    y = coords_xy[..., 1]
    xn = 2 * x / (w - 1) - 1
    yn = 2 * y / (h - 1) - 1
    grid = torch.from_numpy(np.stack([xn, yn], axis=-1).astype(np.float32))
    img = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
    out = F.grid_sample(img, grid, mode="bilinear",
                        padding_mode=padding_mode, align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


def test_grid_sample_matches_torch(rng):
    img = rng.randn(2, 8, 11, 3).astype(np.float32)
    coords = np.stack([
        rng.uniform(-2, 12, size=(2, 8, 11)),
        rng.uniform(-2, 9, size=(2, 8, 11)),
    ], axis=-1).astype(np.float32)
    for pad in ("zeros", "border"):
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords),
                                      padding_mode=pad))
        theirs = _torch_grid_sample(img, coords, pad)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_inverse_warp_disparity_matches_torch(rng):
    img = rng.randn(1, 6, 9, 2).astype(np.float32)
    disp = rng.uniform(-3, 3, size=(1, 6, 9, 1)).astype(np.float32)
    ours = np.asarray(inverse_warp(jnp.asarray(img), jnp.asarray(disp),
                                   mode="disparity"))
    grid = np.asarray(mesh_grid(1, 6, 9))
    coords = np.stack([grid[..., 0] + disp[..., 0], grid[..., 1]], -1)
    theirs = _torch_grid_sample(img, coords, "zeros")
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_shift_1d_matches_3d_grid_sample(rng):
    """shift_1d must equal torch's 5D grid_sample with identity D/H grids
    (the exact construction of reference inverse_warp_3d.py:35-56)."""
    b, d, h, w, c = 1, 4, 5, 7, 3
    img = rng.randn(b, d, h, w, c).astype(np.float32)
    disp = rng.uniform(-3, 3, size=(b, d, h, w)).astype(np.float32)

    ours = np.asarray(shift_1d(jnp.asarray(img), jnp.asarray(disp)))

    gd = np.broadcast_to(np.linspace(0, d - 1, d)[None, :, None, None], (b, d, h, w))
    gh = np.broadcast_to(np.linspace(0, h - 1, h)[None, None, :, None], (b, d, h, w))
    gw = np.broadcast_to(np.arange(w)[None, None, None, :], (b, d, h, w)) + disp
    gdn = gd / (d - 1) * 2 - 1
    ghn = gh / (h - 1) * 2 - 1
    gwn = gw / (w - 1) * 2 - 1
    grid = torch.from_numpy(
        np.stack([gwn, ghn, gdn], axis=-1).astype(np.float32))
    timg = torch.from_numpy(img).permute(0, 4, 1, 2, 3)
    theirs = F.grid_sample(timg, grid, mode="bilinear", padding_mode="zeros",
                           align_corners=True).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_inverse_warp_3d_with_y_shift(rng):
    b, d, h, w, c = 1, 3, 6, 7, 2
    img = rng.randn(b, d, h, w, c).astype(np.float32)
    disp = rng.uniform(-2, 2, size=(b, d, h, w)).astype(np.float32)
    disp_y = rng.uniform(-2, 2, size=(b, d, h, w)).astype(np.float32)

    ours = np.asarray(inverse_warp_3d(jnp.asarray(img), jnp.asarray(disp),
                                      disp_y=jnp.asarray(disp_y)))

    gd = np.broadcast_to(np.linspace(0, d - 1, d)[None, :, None, None], (b, d, h, w))
    gh = np.broadcast_to(np.arange(h)[None, None, :, None], (b, d, h, w)) + disp_y
    gw = np.broadcast_to(np.arange(w)[None, None, None, :], (b, d, h, w)) + disp
    grid = torch.from_numpy(np.stack(
        [gw / (w - 1) * 2 - 1, gh / (h - 1) * 2 - 1, gd / (d - 1) * 2 - 1],
        axis=-1).astype(np.float32))
    timg = torch.from_numpy(img).permute(0, 4, 1, 2, 3)
    theirs = F.grid_sample(timg, grid, mode="bilinear", padding_mode="zeros",
                           align_corners=True).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_project_to_3d_roundtrip_identity(rng):
    """With T = identity the reprojected depth and pixel coords must be the
    originals (flow == 0)."""
    b, h, w = 1, 5, 6
    depth = rng.uniform(1.0, 10.0, size=(b, h, w, 1)).astype(np.float32)
    K = np.array([[[100.0, 0, 3.0], [0, 100.0, 2.5], [0, 0, 1]]],
                 dtype=np.float32)
    T = np.eye(4, dtype=np.float32)[None]
    out = project_to_3d(jnp.asarray(depth), jnp.asarray(K),
                        T_target_to_source=jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(out["triangular_depth"]), depth,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["optical_flow"]),
                               np.zeros((b, h, w, 1, 2)), atol=1e-3)
    assert np.asarray(out["flow_mask"]).all()


def test_project_to_3d_pure_translation(rng):
    """Camera translating along +X by t: flow_x = -fx * t / z, flow_y = 0."""
    b, h, w = 1, 4, 5
    depth = np.full((b, h, w, 1), 4.0, dtype=np.float32)
    fx = 50.0
    K = np.array([[[fx, 0, 2.0], [0, fx, 1.5], [0, 0, 1]]], dtype=np.float32)
    t = 0.2
    T = np.eye(4, dtype=np.float32)[None]
    T[0, 0, 3] = t
    out = project_to_3d(jnp.asarray(depth), jnp.asarray(K),
                        T_target_to_source=jnp.asarray(T))
    flow = np.asarray(out["optical_flow"])
    np.testing.assert_allclose(flow[..., 0], fx * t / 4.0, rtol=1e-4)
    np.testing.assert_allclose(flow[..., 1], 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["triangular_depth"]), depth,
                               rtol=1e-5)
