"""Align-corners interpolation & adaptive pooling, TPU-native.

The reference uses ``F.interpolate(..., align_corners=True)`` pervasively
(~30 call sites, e.g. aggregation/TemporalStereo/module.py:100,106,287,294 and
coarse.py:93-95).  ``jax.image.resize`` implements half-pixel sampling only, so
we build exact align-corners resampling ourselves.

TPU design note: instead of gathers (slow on TPU), resize is expressed as
dense matmuls with *constant* interpolation matrices baked at trace time
(shapes are static under jit).  A bilinear resize of [B,H,W,C] becomes
``R_h @ x @ R_w^T`` — two MXU matmuls whose operands XLA constant-folds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] bilinear align-corners interpolation matrix."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        mat[:, 0] = 1.0
        return mat
    if out_size == 1:
        # align_corners: single output samples source coordinate 0
        mat[0, 0] = 1.0
        return mat
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    w = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] = 1.0 - w
    mat[rows, lo + 1] = w
    return mat


def _apply_axis(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    """Contract ``x`` along ``axis`` with [out, in] matrix."""
    if mat.shape[0] == mat.shape[1] and np.allclose(mat, np.eye(mat.shape[0])):
        return x
    m = jnp.asarray(mat, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    # HIGHEST precision: interpolation weights are exact linear maps and the
    # contraction is tiny next to the convs — don't let the MXU round to bf16.
    x = jnp.einsum("...i,oi->...o", x, m, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(x, -1, axis)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Bilinear align-corners resize. Default layout [..., H, W, C] (NHWC).

    Parity target: ``F.interpolate(mode='bilinear', align_corners=True)``.
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = size
    x = _apply_axis(x, _interp_matrix(x.shape[h_axis], out_h), h_axis)
    x = _apply_axis(x, _interp_matrix(x.shape[w_axis], out_w), w_axis)
    return x


def resize_trilinear(x: jnp.ndarray, size: tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear align-corners resize of NDHWC volume [B, D, H, W, C].

    Parity target: ``F.interpolate(mode='trilinear', align_corners=True)``
    (reference block_cost.py:74, module.py:287,294).
    """
    out_d, out_h, out_w = size
    x = _apply_axis(x, _interp_matrix(x.shape[1], out_d), 1)
    x = _apply_axis(x, _interp_matrix(x.shape[2], out_h), 2)
    x = _apply_axis(x, _interp_matrix(x.shape[3], out_w), 3)
    return x


def upsample_disp(disp: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Resize a [B, H, W, 1] disparity map to ``size`` and rescale its values
    by the width ratio — the reference's ubiquitous
    ``F.interpolate(d * full_w / dw, ...)`` idiom (TemporalStereo.py:305-309).
    """
    scale = size[1] / disp.shape[-2]
    return resize_bilinear(disp * scale, size)


# ---------------------------------------------------------------- pooling --

def avg_pool2d(x: jnp.ndarray, window: tuple[int, int],
               stride: tuple[int, int] | None = None,
               padding: tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Average pool over NHWC (count_include_pad=True, torch default).
    Separable per-axis lowering (see _separable_pool3d)."""
    stride = stride or window
    b, h, w, c = x.shape[-4], x.shape[-3], x.shape[-2], x.shape[-1]
    if (tuple(stride) == tuple(window) and tuple(padding) == (0, 0)
            and h % window[0] == 0 and w % window[1] == 0):
        kh, kw = window
        y = x.reshape(*x.shape[:-3], h // kh, kh, w // kw, kw, c)
        return y.mean(axis=(-4, -2))
    summed = _separable_pool2d(x, window, stride, padding, 0.0, jax.lax.add)
    return summed / (window[0] * window[1])


def max_pool2d(x: jnp.ndarray, window: tuple[int, int],
               stride: tuple[int, int] | None = None,
               padding: tuple[int, int] = (0, 0)) -> jnp.ndarray:
    stride = stride or window
    return _separable_pool2d(x, window, stride, padding, -jnp.inf,
                             jax.lax.max)


def _separable_pool2d(x, window, stride, padding, init, op):
    out = x
    for axis, (k, s, p) in enumerate(zip(window, stride, padding), start=1):
        if k == 1 and s == 1 and p == 0:
            continue
        dims = [1] * x.ndim
        strides = [1] * x.ndim
        pads = [(0, 0)] * x.ndim
        dims[axis] = k
        strides[axis] = s
        pads[axis] = (p, p)
        out = jax.lax.reduce_window(out, init, op, tuple(dims),
                                    tuple(strides), tuple(pads))
    return out


def _shift_add_pool_axis(x: jnp.ndarray, axis: int, k: int, p: int,
                         init, op) -> jnp.ndarray:
    """Stride-1 1D box pool along ``axis`` as k static shifted slices
    combined elementwise — XLA fuses this into one bandwidth-bound loop
    (reduce_window picks pathological layouts for 5-D/6-D operands)."""
    pads = [(0, 0)] * x.ndim
    pads[axis] = (p, p)
    padded = jnp.pad(x, pads, constant_values=init)
    n = x.shape[axis]
    out = None
    for i in range(k):
        sl = jax.lax.slice_in_dim(padded, i, i + n, axis=axis)
        out = sl if out is None else op(out, sl)
    return out


def _separable_pool3d(x: jnp.ndarray, window, stride, padding, init, op,
                      count_full: bool):
    """Run a 3D pool as per-axis 1D passes.

    TPU note: XLA lowers an overlapping k^3 reduce_window naively at
    O(k^3) work per element; the separable form is O(3k).  Stride-1 axes
    use the shift-add formulation (pure elementwise fusion); strided axes
    fall back to a 1D reduce_window.  Mathematically identical for add/max
    since the window is a box.
    """
    out = x
    for axis, (k, s, p) in enumerate(zip(window, stride, padding), start=1):
        if k == 1 and s == 1 and p == 0:
            continue
        if s == 1:
            out = _shift_add_pool_axis(out, axis, k, p, init, op)
            continue
        dims = [1] * x.ndim
        strides = [1] * x.ndim
        pads = [(0, 0)] * x.ndim
        dims[axis] = k
        strides[axis] = s
        pads[axis] = (p, p)
        out = jax.lax.reduce_window(out, init, op, tuple(dims),
                                    tuple(strides), tuple(pads))
    return out


def avg_pool3d(x: jnp.ndarray, window: tuple[int, int, int],
               stride: tuple[int, int, int] | None = None,
               padding: tuple[int, int, int] = (0, 0, 0)) -> jnp.ndarray:
    """Average pool over NDHWC (reference F.avg_pool3d, block_cost.py:68,
    module.py:416; count_include_pad=True semantics).

    Non-overlapping divisible pools (stride == window, no padding — the
    block_cost pyramid case) lower to reshape+mean: a pure bandwidth-bound
    fusion instead of XLA's reduce-window emitter, which picks pathological
    layouts for 5-D operands (~20 GB/s observed)."""
    stride = stride or window
    b, d, h, w, c = x.shape
    if tuple(stride) == tuple(window) and padding == (0, 0, 0):
        # torch floor semantics: truncate the remainder, then reshape-mean
        kd, kh, kw = window
        dt, ht, wt = (d // kd) * kd, (h // kh) * kh, (w // kw) * kw
        y = x[:, :dt, :ht, :wt, :]
        y = y.reshape(b, dt // kd, kd, ht // kh, kh, wt // kw, kw, c)
        return y.mean(axis=(2, 4, 6))
    summed = _separable_pool3d(x, window, stride, padding, 0.0, jax.lax.add,
                               True)
    return summed / (window[0] * window[1] * window[2])


def max_pool3d(x: jnp.ndarray, window: tuple[int, int, int],
               stride: tuple[int, int, int] | None = None,
               padding: tuple[int, int, int] = (0, 0, 0)) -> jnp.ndarray:
    stride = stride or window
    return _separable_pool3d(x, window, stride, padding, -jnp.inf,
                             jax.lax.max, False)


def adaptive_avg_pool2d(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool; requires evenly-divisible sizes (the only
    case exercised by the losses' gt rescaling — smooth_l1_loss.py:57)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    assert h % oh == 0 and w % ow == 0, (
        f"adaptive_avg_pool2d supports divisible sizes only: {(h, w)}->{size}")
    return avg_pool2d(x, (h // oh, w // ow))


def adaptive_max_pool2d(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    assert h % oh == 0 and w % ow == 0, (
        f"adaptive_max_pool2d supports divisible sizes only: {(h, w)}->{size}")
    return max_pool2d(x, (h // oh, w // ow))
