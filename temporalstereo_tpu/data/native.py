"""ctypes bindings for the native data-path library (native/tsnative.cpp).

Auto-builds ``libtsnative.so`` with make on first use when a toolchain is
available; every entry point has a pure-numpy fallback, so the package works
without the native library (it is a throughput optimization, not a
dependency).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libtsnative.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    lib.ts_decode_pfm.restype = ctypes.c_int
    lib.ts_decode_pfm.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_void_p]
    lib.ts_resize_bilinear.restype = None
    lib.ts_resize_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ts_normalize.restype = None
    lib.ts_normalize.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int, ctypes.c_void_p,
                                 ctypes.c_void_p]
    lib.ts_crop.restype = None
    lib.ts_crop.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    if hasattr(lib, "ts_color_jitter"):
        lib.ts_color_jitter.restype = None
        lib.ts_color_jitter.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float]
    if hasattr(lib, "ts_decode_png"):
        lib.ts_decode_png.restype = ctypes.c_int
        lib.ts_decode_png.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_pfm(buf: bytes) -> Tuple[np.ndarray, float]:
    """Native PFM decode; falls back to formats.load_pfm parsing."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.frombuffer(buf, dtype=np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.ts_decode_pfm(ptr, len(buf), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c), None)
    if rc != 0:
        raise ValueError(f"ts_decode_pfm header error {rc}")
    out = np.empty((h.value, w.value, c.value), np.float32)
    rc = lib.ts_decode_pfm(ptr, len(buf), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c),
                           out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"ts_decode_pfm data error {rc}")
    return (out[..., 0] if c.value == 1 else out), 1.0


def decode_png(buf: bytes) -> Optional[np.ndarray]:
    """Native PNG decode (8/16-bit gray/GA/RGB/RGBA, non-interlaced).

    Returns [H, W] or [H, W, C] uint8/uint16, or None when the native
    library is unavailable or the file needs PIL (palette/interlaced) —
    callers fall back to PIL.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "ts_decode_png"):
        return None
    arr = np.frombuffer(buf, dtype=np.uint8)
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.ts_decode_png(ptr, len(buf), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c), ctypes.byref(bd), None)
    if rc != 0:
        return None
    dtype = np.uint16 if bd.value == 16 else np.uint8
    out = np.empty((h.value, w.value, c.value), dtype)
    rc = lib.ts_decode_png(ptr, len(buf), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c), ctypes.byref(bd),
                           out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out[..., 0] if c.value == 1 else out


def resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    oh, ow = size
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    if lib is None:
        from .transforms import resize_image

        out = resize_image(img, size)
        return out[..., 0] if squeeze else out
    out = np.empty((oh, ow, c), np.float32)
    lib.ts_resize_bilinear(img.ctypes.data_as(ctypes.c_void_p), h, w, c,
                           out.ctypes.data_as(ctypes.c_void_p), oh, ow)
    return out[..., 0] if squeeze else out


def color_jitter_inplace(img: np.ndarray, order: np.ndarray, fb: float,
                         fc: float, fs: float, fh: float,
                         fgamma: float) -> Optional[np.ndarray]:
    """Native torchvision-exact color jitter on [H, W, 3] float32 in [0, 1],
    in place (the caller owns the copy).  ``order`` = permutation of the 4
    adjustment ops (brightness/contrast/saturation/hue) — randomness stays
    in Python so the per-batch deterministic-seed contract holds.  Returns
    None when the native library is unavailable (callers fall back to the
    numpy path in data/transforms.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "ts_color_jitter"):
        return None
    assert img.dtype == np.float32 and img.flags.c_contiguous
    assert img.ndim == 3 and img.shape[2] == 3
    order = np.ascontiguousarray(order, np.int32)
    lib.ts_color_jitter(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0] * img.shape[1],
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(order),
        ctypes.c_float(fb), ctypes.c_float(fc), ctypes.c_float(fs),
        ctypes.c_float(fh), ctypes.c_float(fgamma))
    return img


def normalize_inplace(img: np.ndarray, mean: np.ndarray,
                      std: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        img[:] = (img - mean) / std
        return img
    img = np.ascontiguousarray(img, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    h, w, c = img.shape
    lib.ts_normalize(img.ctypes.data_as(ctypes.c_void_p), h * w, c,
                     mean.ctypes.data_as(ctypes.c_void_p),
                     std.ctypes.data_as(ctypes.c_void_p))
    return img
