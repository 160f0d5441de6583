"""Tests for disparity regression and learned upsampling ops."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from temporalstereo_tpu.ops import (
    convex_upsample,
    fractional_disparity_samples,
    hard_argmin,
    linear_disparity_samples,
    mask_upsample_9,
    soft_argmin,
    sort_samples_with_volume,
    topk_soft_argmin,
    unfold3x3,
)


def test_topk_soft_argmin_matches_torch(rng):
    cost = rng.randn(2, 4, 5, 7).astype(np.float32)
    disp = rng.uniform(0, 20, size=(2, 4, 5, 7)).astype(np.float32)
    off = rng.uniform(-1, 1, size=(2, 4, 5, 7)).astype(np.float32)

    d, td, tc = topk_soft_argmin(jnp.asarray(cost), jnp.asarray(disp),
                                 jnp.asarray(off), k=2)

    tcost = torch.from_numpy(cost).permute(0, 3, 1, 2)
    tdisp = torch.from_numpy(disp).permute(0, 3, 1, 2)
    toff = torch.from_numpy(off).permute(0, 3, 1, 2)
    topk_cost, idx = torch.topk(tcost, k=2, dim=1)
    prob = torch.softmax(topk_cost, dim=1)
    topk_disp = torch.gather(tdisp + toff, dim=1, index=idx)
    ref = torch.sum(prob * topk_disp, dim=1, keepdim=True)
    np.testing.assert_allclose(np.asarray(d)[..., 0],
                               ref[:, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(td).transpose(0, 3, 1, 2),
                               topk_disp.numpy(), rtol=1e-4, atol=1e-5)


def test_soft_and_hard_argmin(rng):
    cost = rng.randn(1, 3, 4, 6).astype(np.float32)
    disp = np.broadcast_to(np.arange(6, dtype=np.float32), (1, 3, 4, 6)).copy()
    s = np.asarray(soft_argmin(jnp.asarray(cost), jnp.asarray(disp)))
    prob = torch.softmax(torch.from_numpy(cost), dim=-1).numpy()
    np.testing.assert_allclose(s[..., 0], (prob * disp).sum(-1), rtol=1e-4,
                               atol=1e-5)
    hhard = np.asarray(hard_argmin(jnp.asarray(cost), jnp.asarray(disp)))
    np.testing.assert_allclose(hhard[..., 0], cost.argmax(-1), atol=1e-6)


def test_sort_samples_with_volume(rng):
    disp = rng.uniform(0, 10, size=(1, 3, 4, 5)).astype(np.float32)
    vol = rng.randn(1, 5, 3, 4, 2).astype(np.float32)
    sd, sv = sort_samples_with_volume(jnp.asarray(disp), jnp.asarray(vol))
    sd, sv = np.asarray(sd), np.asarray(sv)
    assert (np.diff(sd, axis=-1) >= 0).all()
    # volume rows follow their sample: check one pixel
    order = np.argsort(disp[0, 1, 2])
    np.testing.assert_allclose(sv[0, :, 1, 2], vol[0, order, 1, 2], atol=1e-6)


def test_disparity_sample_generators():
    lin = np.asarray(linear_disparity_samples(1, 2, 3, 4))
    assert lin.shape == (1, 2, 3, 4)
    np.testing.assert_allclose(lin[0, 0, 0], np.arange(4.0))

    low = np.full((1, 2, 2, 1), 2.0, np.float32)
    high = np.full((1, 2, 2, 1), 10.0, np.float32)
    fr = np.asarray(fractional_disparity_samples(jnp.asarray(low),
                                                 jnp.asarray(high)))
    np.testing.assert_allclose(fr[0, 0, 0], [2.0, 5.0, 6.0, 7.0, 10.0])
    # swapped bounds behave like (min, |high-low|) (reference fine.py:86)
    fr2 = np.asarray(fractional_disparity_samples(jnp.asarray(high),
                                                  jnp.asarray(low)))
    np.testing.assert_allclose(fr2, fr)


def test_unfold3x3_matches_torch(rng):
    x = rng.randn(1, 4, 5, 2).astype(np.float32)
    ours = np.asarray(unfold3x3(jnp.asarray(x)))
    t = F.unfold(torch.from_numpy(x).permute(0, 3, 1, 2),
                 kernel_size=3, padding=1)  # [B, C*9, H*W]
    t = t.reshape(1, 2, 9, 4, 5).permute(0, 3, 4, 2, 1).numpy()
    np.testing.assert_allclose(ours, t, atol=1e-6)


def test_convex_upsample_matches_torch_reference(rng):
    """Full parity with the reference ConvexUpsample math (module.py:331-353),
    given identical mask logits."""
    b, h, w, up = 1, 4, 6, 2
    disp = rng.randn(b, h, w, 1).astype(np.float32)
    mask = rng.randn(b, h, w, 9 * up * up).astype(np.float32)

    ours = np.asarray(convex_upsample(jnp.asarray(disp), jnp.asarray(mask),
                                      upscale_factor=up))

    tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    tdisp = torch.from_numpy(disp).permute(0, 3, 1, 2)
    m = tmask.view(b, 1, 9, up, up, h, w)
    m = torch.softmax(m, dim=2)
    ud = F.unfold(tdisp * up, kernel_size=3, padding=1)
    ud = ud.view(b, 1, 9, 1, 1, h, w)
    out = torch.sum(m * ud, dim=2)
    out = out.permute(0, 1, 4, 2, 5, 3).reshape(b, 1, h * up, w * up)
    np.testing.assert_allclose(ours[..., 0], out[:, 0].numpy(), rtol=1e-4,
                               atol=1e-5)


def test_mask_upsample_9_matches_torch_reference(rng):
    """Parity with UNet.upsample (module.py:468-483)."""
    b, h, w = 1, 8, 12
    dh, dw = 2, 3
    disp = rng.randn(b, dh, dw, 1).astype(np.float32)
    mask = rng.randn(b, h, w, 9).astype(np.float32)

    ours = np.asarray(mask_upsample_9(jnp.asarray(disp), jnp.asarray(mask)))

    tmask = torch.softmax(torch.from_numpy(mask).permute(0, 3, 1, 2), dim=1)
    tdisp = torch.from_numpy(disp).permute(0, 3, 1, 2)
    ud = F.unfold(tdisp, kernel_size=3, padding=1).reshape(b, 9, dh, dw)
    full = F.interpolate(ud * w / dw, size=(h, w), mode="bilinear",
                         align_corners=True)
    ref = torch.sum(full * tmask, dim=1, keepdim=True)
    np.testing.assert_allclose(ours[..., 0], ref[:, 0].numpy(), rtol=1e-4,
                               atol=1e-5)
