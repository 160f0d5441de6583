"""Disparity colormaps (KITTI-style).

Re-design of reference
``architecture/utils/visualization/disparity_colormap.py`` (:1-219):
the KITTI histogram-equalized disparity colormap ``disp_to_color`` and the
log-binned error maps ``disp_err_to_color`` / ``disp_err_to_colorbar``.
"""
from __future__ import annotations

import numpy as np

# KITTI devkit color wheel: (cumulative weight, rgb) segments
_KITTI_MAP = np.array([
    [0, 0, 0, 114], [0, 0, 1, 185], [1, 0, 0, 114], [1, 0, 1, 174],
    [0, 1, 0, 114], [0, 1, 1, 185], [1, 1, 0, 114], [1, 1, 1, 0],
], dtype=np.float64)


def _kitti_colormap():
    weights = _KITTI_MAP[:, 3]
    cumsum = np.zeros(8)
    cumsum[1:] = np.cumsum(weights[:-1])
    total = cumsum[-1] + weights[-2]
    return _KITTI_MAP[:, :3], weights, cumsum / total, total


def disp_to_color(disp: np.ndarray, max_disp: float | None = None
                  ) -> np.ndarray:
    """[H, W] disparity -> [H, W, 3] uint8-range float RGB in [0, 1]
    (reference disp_map/disp_to_color)."""
    disp = np.asarray(disp, dtype=np.float64)
    if max_disp is None or max_disp <= 0:
        max_disp = max(float(disp.max()), 1e-6)
    x = np.clip(disp / max_disp, 0.0, 1.0)

    colors, weights, bins, total = _kitti_colormap()
    h, w = x.shape
    out = np.zeros((h, w, 3))
    idx = np.digitize(x.ravel(), bins[1:], right=True)
    idx = np.clip(idx, 0, 6)
    lo = bins[idx]
    span = np.where(idx < 7, bins[np.minimum(idx + 1, 7)] - lo, 1.0)
    frac = np.clip((x.ravel() - lo) / np.maximum(span, 1e-9), 0, 1)
    c0 = colors[idx]
    c1 = colors[np.minimum(idx + 1, 7)]
    rgb = c0 * (1 - frac[:, None]) + c1 * frac[:, None]
    out = rgb.reshape(h, w, 3)
    return out.astype(np.float32)


_ERR_COLORS = np.array([
    [0.1875, 0.1875, 0.1875, 49, 54, 149],
    [0.375, 0.375, 0.375, 69, 117, 180],
    [0.75, 0.75, 0.75, 116, 173, 209],
    [1.5, 1.5, 1.5, 171, 217, 233],
    [3, 3, 3, 224, 243, 248],
    [6, 6, 6, 254, 224, 144],
    [12, 12, 12, 253, 174, 97],
    [24, 24, 24, 244, 109, 67],
    [48, 48, 48, 215, 48, 39],
    [np.inf, np.inf, np.inf, 165, 0, 38],
], dtype=np.float64)


def disp_err_to_color(est: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Log-binned error colorization (reference disp_err_to_color)."""
    err = np.abs(np.asarray(est, np.float64) - np.asarray(gt, np.float64))
    rel = err / np.maximum(np.abs(gt), 1e-9)
    metric = np.minimum(err / 3.0, rel * 20.0)
    h, w = err.shape
    out = np.zeros((h, w, 3), np.float32)
    prev = 0.0
    for row in _ERR_COLORS:
        ub = row[0] / 3.0 if np.isfinite(row[0]) else np.inf
        m = (metric >= prev) & (metric < ub)
        out[m] = row[3:6] / 255.0
        prev = ub
    out[gt <= 0] = 0.0
    return out


def disp_err_to_colorbar(est: np.ndarray, gt: np.ndarray,
                         with_bar: bool = False) -> np.ndarray:
    """Error map plus an appended horizontal color legend
    (reference disp_err_to_colorbar)."""
    img = disp_err_to_color(est, gt)
    if not with_bar:
        return img
    h, w = img.shape[:2]
    bar_h = max(h // 16, 4)
    bar = np.zeros((bar_h, w, 3), np.float32)
    n = len(_ERR_COLORS)
    for i, row in enumerate(_ERR_COLORS):
        x0 = int(i * w / n)
        x1 = int((i + 1) * w / n)
        bar[:, x0:x1] = row[3:6] / 255.0
    return np.concatenate([img, bar], axis=0)
