"""Learned-upsampling ops: 3x3 unfold + convex combination.

Re-designs of the reference's RAFT-style ConvexUpsample
(aggregation/TemporalStereo/module.py:300-353) and the UNet 9-way mask
upsample (module.py:468-483).  ``F.unfold`` is replaced with 9 static shifts —
fused by XLA into vectorized slices, no gather.
"""
from __future__ import annotations

import jax.numpy as jnp

from .interpolate import resize_bilinear


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Extract 3x3 neighbourhoods: [B, H, W, C] -> [B, H, W, 9, C].

    Window order matches ``F.unfold(kernel_size=3, padding=1)``:
    k = dy * 3 + dx, with (dy, dx) in row-major order over the window.
    """
    b, h, w, c = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [pad[:, dy:dy + h, dx:dx + w, :]
               for dy in range(3) for dx in range(3)]
    return jnp.stack(patches, axis=3)


def convex_upsample(disp: jnp.ndarray, mask_logits: jnp.ndarray,
                    upscale_factor: int = 2, window_size: int = 3,
                    disp_scale: float | None = None) -> jnp.ndarray:
    """Convex upsampling of a disparity map with learned per-subpixel masks.

    disp: [B, H, W, 1]; mask_logits: [B, H, W, window^2 * up^2].
    Returns [B, H*up, W*up, 1].
    Reference: ConvexUpsample.forward (module.py:318-353) — mask softmax over
    the 3x3 window, disparity values scaled by the upsample factor.
    """
    assert window_size == 3, "only 3x3 windows supported (reference default)"
    b, h, w, _ = disp.shape
    up = upscale_factor
    if disp_scale is None:
        disp_scale = float(up)

    # [B, H, W, 9, up*up] with softmax over the window axis
    mask = mask_logits.reshape(b, h, w, window_size ** 2, up * up)
    mask = jnp.exp(mask - jnp.max(mask, axis=3, keepdims=True))
    mask = mask / jnp.sum(mask, axis=3, keepdims=True)

    patches = unfold3x3(disp * disp_scale)[..., 0]            # [B, H, W, 9]
    out = jnp.einsum("bhwk,bhwku->bhwu", patches, mask)       # [B, H, W, up*up]
    out = out.reshape(b, h, w, up, up)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, h * up, w * up, 1)
    return out


def mask_upsample_9(disp: jnp.ndarray, mask_logits: jnp.ndarray) -> jnp.ndarray:
    """UNet decoder's full-resolution 9-way upsample (module.py:468-483).

    disp: [B, dh, dw, 1] low-res disparity; mask_logits: [B, H, W, 9].
    The 9 unfolded low-res maps are bilinearly resized (align-corners) to
    (H, W) with the disparity magnitude rescaled by W/dw, then convexly
    combined with softmax(mask).
    """
    b, h, w, _ = mask_logits.shape
    dh, dw = disp.shape[1:3]
    mask = jnp.exp(mask_logits - jnp.max(mask_logits, axis=-1, keepdims=True))
    mask = mask / jnp.sum(mask, axis=-1, keepdims=True)

    patches = unfold3x3(disp)[..., 0]                         # [B, dh, dw, 9]
    patches = resize_bilinear(patches * (w / dw), (h, w))     # [B, H, W, 9]
    return jnp.sum(patches * mask, axis=-1, keepdims=True)
