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


def _rgb_to_hsv(rgb: np.ndarray):
    """Vectorized RGB->HSV on [H, W, 3] floats in [0, 1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = rgb.max(axis=-1)
    minc = rgb.min(axis=-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    safe = np.maximum(delta, 1e-12)
    h = np.where(maxc == r, (g - b) / safe,
                 np.where(maxc == g, 2.0 + (b - r) / safe,
                          4.0 + (r - g) / safe))
    h = np.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Branchless HSV->RGB: per channel c with offset n in (5, 3, 1),
    rgb_c = v * (1 - s * clip(min(k, 4-k), 0, 1)) with k = (n + 6h) mod 6 —
    the exact piecewise formula without np.select's 6 stacked candidate
    arrays (which dominated the round-3 aug profile)."""
    h6 = (h % 1.0) * 6.0
    out = np.empty(h.shape + (3,), np.float32)
    for c, n in enumerate((5.0, 3.0, 1.0)):
        k = (n + h6) % 6.0
        t = np.minimum(k, 4.0 - k, out=k)
        np.clip(t, 0.0, 1.0, out=t)
        out[..., c] = v * (1.0 - s * t)
    return out


def _blend(img1: np.ndarray, img2: np.ndarray, ratio: float) -> np.ndarray:
    """torchvision _blend: ratio*img1 + (1-ratio)*img2, clamped to [0, 1]."""
    return np.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def _grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 luma (torchvision rgb_to_grayscale)."""
    return (0.2989 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness: Tuple[float, float] = (0.4, 2.0),
                 contrast: Tuple[float, float] = (0.5, 1.5),
                 saturation: Tuple[float, float] = (0.5, 1.5),
                 hue: Tuple[float, float] = (-0.1, 0.1),
                 gamma: Tuple[float, float] = (0.8, 1.2),
                 use_native: Optional[bool] = None) -> np.ndarray:
    """torchvision-semantics ColorJitter + gamma aug on [H, W, 3] floats in
    [0, 1] — the reference's train-time photometric pipeline with its exact
    factor ranges (base.py:73-97: ColorJitter((0.4,2.0),(0.5,1.5),(0.5,1.5),
    (-0.1,0.1)) then AdjustGamma(0.8,1.2)).

    Matches torchvision: the four adjustments run in RANDOM order; blends use
    ``ratio*img + (1-ratio)*target`` with clamping; hue is a true HSV
    rotation.

    All randomness is drawn HERE (factors, op order, gamma — one fixed
    rng-consumption sequence), then the pixel work runs in the native C++
    kernel (native/tsnative.cpp ts_color_jitter, the measured #1 host cost
    of loader assembly) when built, else in the numpy path below; the two
    are pinned against each other in tests/test_visualization_native.py.  ``use_native``:
    None = auto, False forces numpy (parity tests).
    """
    fb = rng.uniform(*brightness)
    fc = rng.uniform(*contrast)
    fs = rng.uniform(*saturation)
    fh = rng.uniform(*hue)
    order = rng.permutation(4)
    g = rng.uniform(*gamma)

    if use_native is None:
        use_native = img.ndim == 3 and img.shape[-1] == 3
    if use_native:
        from . import native

        out = np.ascontiguousarray(img, np.float32)
        out = out.copy() if out is img else out
        if native.color_jitter_inplace(out, order, fb, fc, fs, fh,
                                       g) is not None:
            return out

    out = img.astype(np.float32)
    for op in order:
        if op == 0:  # brightness: blend with zero image
            out = np.clip(out * fb, 0.0, 1.0)
        elif op == 1:  # contrast: blend with mean of grayscale
            out = _blend(out, _grayscale(out).mean(), fc)
        elif op == 2:  # saturation: blend with grayscale
            out = _blend(out, _grayscale(out), fs)
        else:  # hue rotation in HSV
            h, s, v = _rgb_to_hsv(out)
            out = _hsv_to_rgb((h + fh) % 1.0, s, v)
    out = np.clip(out, 0.0, 1.0) ** g
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def normalize(img: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD
              ) -> np.ndarray:
    # same op sequence as torchvision F.normalize (sub then div => identical
    # rounding), but with one allocated temporary instead of three
    out = np.subtract(img, np.asarray(mean, np.float32), dtype=np.float32)
    np.divide(out, np.asarray(std, np.float32), out=out)
    return out


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
