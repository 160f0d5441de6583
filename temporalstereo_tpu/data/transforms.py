"""Data augmentation & preprocessing (numpy/PIL; host-side).

Re-design of reference ``StereoDatasetBase.do_transform``
(architecture/data/datasets/base.py:99-187):
  * 50%-probability color jitter (brightness/contrast/saturation/hue) +
    gamma aug on train (:73-97)
  * ImageNet mean/std normalization (:127)
  * random crop on train (:137-155) + random right-view occlusion patches
    (:158-173)
  * bilinear resize to eval size with disparity value rescaling (:177-185)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.05,
                 gamma: Tuple[float, float] = (0.8, 1.2)) -> np.ndarray:
    """Photometric aug on [H, W, 3] float image in [0, 1]."""
    out = img
    b = 1.0 + rng.uniform(-brightness, brightness)
    out = out * b
    c = 1.0 + rng.uniform(-contrast, contrast)
    mean = out.mean()
    out = (out - mean) * c + mean
    s = 1.0 + rng.uniform(-saturation, saturation)
    gray = out.mean(axis=-1, keepdims=True)
    out = gray + (out - gray) * s
    if hue > 0:
        shift = rng.uniform(-hue, hue)
        # cheap hue rotation via channel mixing
        out = out + shift * (np.roll(out, 1, axis=-1) - out)
    g = rng.uniform(*gamma)
    out = np.clip(out, 0.0, 1.0) ** g
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def normalize(img: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD
              ) -> np.ndarray:
    return ((img - mean) / std).astype(np.float32)


def denormalize(img: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD
                ) -> np.ndarray:
    return (img * std + mean).astype(np.float32)


def random_crop_params(rng: np.random.RandomState, h: int, w: int,
                       crop_h: int, crop_w: int) -> Tuple[int, int]:
    y = rng.randint(0, max(h - crop_h, 0) + 1)
    x = rng.randint(0, max(w - crop_w, 0) + 1)
    return y, x


def crop(arr: np.ndarray, y: int, x: int, h: int, w: int) -> np.ndarray:
    return arr[y:y + h, x:x + w]


def right_occlusion_aug(right: np.ndarray, rng: np.random.RandomState,
                        prob: float = 0.5,
                        patch_h: Tuple[int, int] = (50, 125),
                        patch_w: Tuple[int, int] = (50, 250)) -> np.ndarray:
    """Paste a mean-colored rectangle into the right view (reference
    base.py:158-173) — simulates occlusion so matching learns robustness."""
    if rng.rand() >= prob:
        return right
    h, w = right.shape[:2]
    ph = rng.randint(patch_h[0], patch_h[1])
    pw = rng.randint(patch_w[0], patch_w[1])
    ph, pw = min(ph, h), min(pw, w)
    y = rng.randint(0, h - ph + 1)
    x = rng.randint(0, w - pw + 1)
    out = right.copy()
    out[y:y + ph, x:x + pw] = right.mean(axis=(0, 1))
    return out


def resize_image(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize of [H, W, C] float to (h, w).

    Uses the native align-corners kernel (native/tsnative.cpp) when built —
    bit-consistent with the model-side ops.resize_bilinear — with a PIL
    fallback."""
    h, w = size
    if img.shape[:2] == (h, w):
        return img
    from . import native

    if native.available():
        return native.resize_bilinear(img, size)
    chans = []
    for c in range(img.shape[2]):
        p = Image.fromarray(img[..., c])
        chans.append(np.asarray(p.resize((w, h), Image.BILINEAR)))
    return np.stack(chans, axis=-1).astype(np.float32)


def resize_disparity(disp: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Resize [H, W] disparity with value rescaling by the width ratio."""
    h, w = size
    if disp.shape[:2] == (h, w):
        return disp
    scale = w / disp.shape[1]
    from . import native

    if native.available():
        return native.resize_bilinear(disp, size) * scale
    p = Image.fromarray(disp)
    return (np.asarray(p.resize((w, h), Image.BILINEAR)) * scale
            ).astype(np.float32)


def scale_intrinsics(K: np.ndarray, scale_x: float, scale_y: float
                     ) -> np.ndarray:
    out = K.copy()
    out[0, :] *= scale_x
    out[1, :] *= scale_y
    return out


def crop_intrinsics(K: np.ndarray, y: int, x: int) -> np.ndarray:
    out = K.copy()
    out[0, 2] -= x
    out[1, 2] -= y
    return out
