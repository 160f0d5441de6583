"""Parity tests for the TPU-optimized op variants against their canonical
formulations (the variants replace XLA sort/top_k/gather lowerings)."""
import numpy as np

import jax
import jax.numpy as jnp

from temporalstereo_tpu.ops.sampling import (
    _topk_onehot,
    sort_samples_with_volume,
    topk_soft_argmin,
)
from temporalstereo_tpu.ops.warp import shift_1d, shift_1d_matmul


def test_topk_onehot_matches_lax_topk(rng):
    x = rng.randn(2, 4, 5, 14).astype(np.float32)
    payload = rng.randn(2, 4, 5, 14).astype(np.float32)
    vals, pays = _topk_onehot(jnp.asarray(x), jnp.asarray(payload), 2)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(x), 2)
    ref_pays = jnp.take_along_axis(jnp.asarray(payload), ref_idx, axis=-1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pays), np.asarray(ref_pays),
                               atol=1e-6)


def test_topk_onehot_with_duplicates():
    x = jnp.asarray([[[[3.0, 5.0, 5.0, 1.0]]]])
    payload = jnp.asarray([[[[10.0, 20.0, 30.0, 40.0]]]])
    vals, pays = _topk_onehot(x, payload, 2)
    np.testing.assert_allclose(np.asarray(vals)[0, 0, 0], [5.0, 5.0])
    # ties resolve to the lowest index first (lax.top_k semantics)
    np.testing.assert_allclose(np.asarray(pays)[0, 0, 0], [20.0, 30.0])


def test_topk_soft_argmin_small_vs_large_path(rng):
    cost = rng.randn(1, 3, 4, 14).astype(np.float32)
    disp = rng.uniform(0, 20, size=(1, 3, 4, 14)).astype(np.float32)
    off = rng.uniform(-1, 1, size=(1, 3, 4, 14)).astype(np.float32)
    d1 = topk_soft_argmin(jnp.asarray(cost), jnp.asarray(disp),
                          jnp.asarray(off), 2)[0]
    # force the lax.top_k path by faking a large D threshold
    tc, idx = jax.lax.top_k(jnp.asarray(cost), 2)
    td = jnp.take_along_axis(jnp.asarray(disp + off), idx, axis=-1)
    prob = jax.nn.softmax(tc, axis=-1)
    d2 = jnp.sum(prob * td, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_rank_sort_matches_argsort(rng):
    disp = rng.uniform(0, 10, size=(1, 3, 4, 9)).astype(np.float32)
    vol = rng.randn(1, 9, 3, 4, 2).astype(np.float32)
    sd, sv = sort_samples_with_volume(jnp.asarray(disp), jnp.asarray(vol))
    order = np.argsort(disp, axis=-1, kind="stable")
    ref_sd = np.take_along_axis(disp, order, axis=-1)
    np.testing.assert_allclose(np.asarray(sd), ref_sd, atol=1e-6)
    o = order[0, 1, 2]
    np.testing.assert_allclose(np.asarray(sv)[0, :, 1, 2],
                               vol[0, o, 1, 2], atol=1e-6)


def test_rank_sort_with_duplicate_samples():
    disp = jnp.asarray([[[[2.0, 1.0, 2.0, 0.0]]]])
    vol = jnp.arange(4.0).reshape(1, 4, 1, 1, 1)
    sd, sv = sort_samples_with_volume(disp, vol)
    np.testing.assert_allclose(np.asarray(sd)[0, 0, 0], [0, 1, 2, 2])
    np.testing.assert_allclose(np.asarray(sv)[0, :, 0, 0, 0], [3, 1, 0, 2])


def test_shift_matmul_matches_gather(rng):
    b, d, h, w, c = 1, 3, 5, 24, 8
    img = jnp.asarray(rng.rand(b, 1, h, w, c), jnp.float32)
    shift = jnp.asarray(rng.uniform(-10, 10, (b, d, h, w)), jnp.float32)
    ref = shift_1d(img, shift)
    out = shift_1d_matmul(img, shift)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_shift_matmul_gradients_match(rng):
    b, d, h, w, c = 1, 2, 3, 16, 4
    img = jnp.asarray(rng.rand(b, 1, h, w, c), jnp.float32)
    shift = jnp.asarray(rng.uniform(-4, 4, (b, d, h, w)), jnp.float32)
    g1 = jax.grad(lambda i, s: jnp.sum(shift_1d(i, s) ** 2),
                  argnums=(0, 1))(img, shift)
    g2 = jax.grad(lambda i, s: jnp.sum(shift_1d_matmul(i, s) ** 2),
                  argnums=(0, 1))(img, shift)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-4)


def test_depth_axis_conv3d_matches_torch(rng):
    """The (kd,1,1) Conv3d path (tap-shifted channel matmuls, layers.py
    _DepthAxisConv) must equal torch.nn.Conv3d exactly for every
    stride/padding/dilation combination the model uses."""
    import torch

    from temporalstereo_tpu.nn.layers import Conv3d

    for kd, sd, pd, dil, bias in [
        (3, 1, 1, 1, True),    # DepthwiseConv3D stride 1
        (3, 2, 1, 1, False),   # ResidualBlock3D downsample
        (3, 1, 2, 2, True),    # dilated init3d tail
        (5, 1, 2, 1, True),
        (3, 2, 1, 2, False),
    ]:
        x = rng.randn(2, 9, 4, 5, 6).astype(np.float32)
        m = Conv3d(7, (kd, 1, 1), (sd, 1, 1), (pd, 0, 0), (dil, 1, 1),
                   use_bias=bias, norm=None, activation=None)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        kern = np.asarray(v["params"]["Conv_0"]["kernel"])  # (kd,1,C,F)
        assert kern.shape == (kd, 1, 6, 7)
        y = np.asarray(m.apply(v, jnp.asarray(x)))

        tm = torch.nn.Conv3d(6, 7, (kd, 1, 1), (sd, 1, 1), (pd, 0, 0),
                             (dil, 1, 1), bias=bias)
        with torch.no_grad():
            tm.weight.copy_(torch.from_numpy(
                np.transpose(kern, (3, 2, 0, 1))[..., None].copy()))
            if bias:
                tm.bias.copy_(torch.from_numpy(
                    np.asarray(v["params"]["Conv_0"]["bias"]).copy()))
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())
        yt = tm(xt).detach().numpy().transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(y, yt, atol=2e-5)


def test_depth_axis_convtranspose3d_matches_torch(rng):
    """The (kd,1,1) ConvTranspose3d path (slot-interleave scatter,
    layers.py _DepthAxisConvTranspose) must equal torch.nn.ConvTranspose3d."""
    import torch

    from temporalstereo_tpu.nn.layers import ConvTranspose3d

    for kd, sd, pd, od, bias in [
        (3, 2, 1, 1, False),   # ResidualBlock3D upsample
        (3, 2, 1, 0, True),
        (3, 1, 1, 0, True),
        (4, 2, 1, 1, False),
        (2, 2, 0, 0, True),
    ]:
        x = rng.randn(2, 6, 4, 5, 6).astype(np.float32)
        m = ConvTranspose3d(7, (kd, 1, 1), (sd, 1, 1), (pd, 0, 0),
                            (od, 0, 0), use_bias=bias, norm=None,
                            activation=None)
        v = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
        kern = np.asarray(v["params"]["ConvTranspose2d_0"]["kernel"])
        assert kern.shape == (kd, 1, 6, 7)
        y = np.asarray(m.apply(v, jnp.asarray(x)))

        tm = torch.nn.ConvTranspose3d(6, 7, (kd, 1, 1), (sd, 1, 1),
                                      (pd, 0, 0), (od, 0, 0), bias=bias)
        with torch.no_grad():
            # torch ConvTranspose3d weight: [in, out, kd, 1, 1]
            tm.weight.copy_(torch.from_numpy(
                np.transpose(kern, (2, 3, 0, 1))[..., None].copy()))
            if bias:
                tm.bias.copy_(torch.from_numpy(np.asarray(
                    v["params"]["ConvTranspose2d_0"]["bias"]).copy()))
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)).copy())
        yt = tm(xt).detach().numpy().transpose(0, 2, 3, 4, 1)
        assert y.shape == yt.shape, (y.shape, yt.shape)
        np.testing.assert_allclose(y, yt, atol=2e-5)
