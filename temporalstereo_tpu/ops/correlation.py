"""Patch correlation + RAFT-style correlation pyramids.

TPU-native re-designs of:
  * ``aggregation/utils/correlation.py`` (:9-57) — the reference wraps the
    external spatial_correlation_sampler CUDA extension; here the
    shifted-window correlation is built from static shifts (XLA fuses them,
    no gather, no custom op)
  * ``aggregation/utils/raft_corr.py`` — CorrBlock all-pairs stereo pyramid
    (:4-67), FlowCorrBlock (:71-144), bilinear_sampler (:146-160)

These are API-surface components: unused in the flagship model path (same as
the reference) but available for flow/stereo variants.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from .interpolate import avg_pool2d
from .warp import grid_sample


def correlation2d(fm1: jnp.ndarray, fm2: jnp.ndarray, patch_size: int = 21,
                  dilation: int = 1) -> jnp.ndarray:
    """Dense patch correlation: for every displacement (dy, dx) in a
    patch_size x patch_size window, mean over channels of fm1 * shift(fm2).

    fm1/fm2: [B, H, W, C] -> [B, H, W, patch_size**2].
    Matches spatial_correlation_sampler semantics (correlation.py:20-33).
    """
    b, h, w, c = fm1.shape
    r = patch_size // 2
    outs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sy, sx = dy * dilation, dx * dilation
            shifted = jnp.roll(fm2, shift=(-sy, -sx), axis=(1, 2))
            # zero out wrapped regions
            if sy != 0 or sx != 0:
                mask_y = jnp.ones((h,), fm2.dtype)
                if sy > 0:
                    mask_y = mask_y.at[h - sy:].set(0)
                elif sy < 0:
                    mask_y = mask_y.at[:-sy].set(0)
                mask_x = jnp.ones((w,), fm2.dtype)
                if sx > 0:
                    mask_x = mask_x.at[w - sx:].set(0)
                elif sx < 0:
                    mask_x = mask_x.at[:-sx].set(0)
                shifted = shifted * mask_y[None, :, None, None]
                shifted = shifted * mask_x[None, None, :, None]
            outs.append(jnp.mean(fm1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def correlation1d(fm1: jnp.ndarray, fm2: jnp.ndarray, patch_size: int = 21,
                  dilation: int = 1) -> jnp.ndarray:
    """Horizontal-only patch correlation (stereo; correlation.py:36-57).
    -> [B, H, W, patch_size]."""
    b, h, w, c = fm1.shape
    r = patch_size // 2
    outs = []
    for dx in range(-r, r + 1):
        sx = dx * dilation
        shifted = jnp.roll(fm2, shift=-sx, axis=2)
        if sx != 0:
            mask_x = jnp.ones((w,), fm2.dtype)
            if sx > 0:
                mask_x = mask_x.at[w - sx:].set(0)
            else:
                mask_x = mask_x.at[:-sx].set(0)
            shifted = shifted * mask_x[None, None, :, None]
        outs.append(jnp.mean(fm1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


class CorrBlock:
    """RAFT-style all-pairs stereo correlation pyramid + radius lookup
    (raft_corr.py:4-67).  fmap1/fmap2: [B, H, W, C].

    Lookup semantics match the reference's grid_sample call EXACTLY
    (pinned against the real code, tests/test_refshim_extras.py),
    including its align_corners=False quirks: normalized x uses the
    FULL-resolution ``w-1`` at every level while the sampled level has
    width ``w/2^l`` (so the effective pixel position is
    ``(x/2^l + delta) * wl/(w-1) - 0.5``), and the constant y=-1 grid
    coordinate is divided by ``2^l`` too, which scales level ``l`` by
    ``1 - 2^-(l+1)`` through the zero-padded bilinear y-tap."""

    def __init__(self, fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        b, h, w, c = fmap1.shape
        # all-pairs along the scanline: [B, H, W1, W2]
        corr = jnp.einsum("bhic,bhjc->bhij", fmap1, fmap2,
                          precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
            jnp.asarray(c, fmap1.dtype))
        self.pyramid: List[jnp.ndarray] = []
        self.shape = (b, h, w)
        lvl = corr.reshape(b * h * w, w)
        for _ in range(num_levels):
            self.pyramid.append(lvl)
            if lvl.shape[-1] >= 2:
                lvl = lvl.reshape(lvl.shape[0], -1, 2).mean(-1)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords: [B, H, W] x-position in fmap2 -> [B, H, W,
        num_levels*(2r+1)] correlation features."""
        b, h, w = self.shape
        r = self.radius
        out = []
        x0 = coords.reshape(-1)  # [BHW]
        for lvl, corr in enumerate(self.pyramid):
            wl = corr.shape[-1]
            offsets = jnp.arange(-r, r + 1, dtype=coords.dtype)
            # reference pixel position (see class docstring)
            pos = ((x0[:, None] / (2 ** lvl) + offsets[None, :])
                   * (wl / (w - 1)) - 0.5)
            lo = jnp.floor(pos)
            frac = pos - lo
            lo_i = jnp.clip(lo.astype(jnp.int32), 0, wl - 1)
            # hi tap index from the UNCLIPPED floor: for pos < 0 the hi tap
            # is pixel 0, not lo_i + 1
            hi_i = jnp.clip(lo.astype(jnp.int32) + 1, 0, wl - 1)
            v_lo = (jnp.take_along_axis(corr, lo_i, axis=1)
                    * ((lo >= 0) & (lo <= wl - 1)).astype(corr.dtype))
            v_hi = (jnp.take_along_axis(corr, hi_i, axis=1)
                    * ((lo + 1 >= 0) & (lo + 1 <= wl - 1)).astype(corr.dtype))
            y_weight = 1.0 - 0.5 ** (lvl + 1)
            out.append(((1 - frac) * v_lo + frac * v_hi) * y_weight)
        feat = jnp.concatenate(out, axis=-1)
        return feat.reshape(b, h, w, -1)


class FlowCorrBlock:
    """RAFT all-pairs 2D pyramid (raft_corr.py:71-144).

    Reference-exact semantics (pinned against the real code,
    tests/test_refshim_extras.py): the "correlation" is NOT a dot product —
    it is the GRAM-matrix expression ``f1_i.f1_j - 2 f1_i.f2_j + f2_i.f2_j``
    (raft_corr.py:117-122; only its diagonal is a squared distance), and the
    lookup window is built from ``meshgrid(dy, dx)`` whose first channel
    lands on the x coordinate — window entry (i, j) samples
    ``(x + delta[i], y + delta[j])``, the transpose of the conventional
    ordering."""

    def __init__(self, fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        b, h, w, c = fmap1.shape
        self.shape = (b, h, w)
        f1 = fmap1.reshape(b, h * w, c)
        f2 = fmap2.reshape(b, h * w, c)
        hi = jax.lax.Precision.HIGHEST
        x2 = jnp.einsum("bic,bjc->bij", f1, f1, precision=hi)
        y2 = jnp.einsum("bic,bjc->bij", f2, f2, precision=hi)
        xy = jnp.einsum("bic,bjc->bij", f1, f2, precision=hi)
        corr = (x2 - 2 * xy + y2) / jnp.sqrt(jnp.asarray(c, fmap1.dtype))
        corr = corr.reshape(b * h * w, h, w, 1)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = avg_pool2d(corr, (2, 2))
            self.pyramid.append(corr)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords: [B, H, W, 2] (x, y) target positions ->
        [B, H, W, num_levels*(2r+1)^2]."""
        b, h, w = self.shape
        r = self.radius
        out = []
        flat = coords.reshape(b * h * w, 1, 1, 2)
        d = jnp.arange(-r, r + 1, dtype=coords.dtype)
        di, dj = jnp.meshgrid(d, d, indexing="ij")
        # reference window ordering: entry (i, j) offsets x by d[i], y by d[j]
        delta = jnp.stack([di, dj], axis=-1)[None]          # [1, 2r+1, 2r+1, 2]
        for lvl, corr in enumerate(self.pyramid):
            centroid = flat / (2 ** lvl)
            pos = centroid + delta                           # [BHW, P, P, 2]
            sampled = grid_sample(corr, pos, padding_mode="zeros")
            out.append(sampled.reshape(b, h, w, -1))
        return jnp.concatenate(out, axis=-1)
