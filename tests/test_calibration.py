"""Calibration / projection tests: velo<->rect<->image<->depth round trips
(reference projection.py:102-260) and ETH3D per-scene calib parsing
(reference load_eth3d.py)."""
import numpy as np
import pytest

from temporalstereo_tpu.data.calibration import Projection, read_calib_file

CALIB_TEXT = """\
P_rect_02: 721.5377 0.0 609.5593 44.85728 0.0 721.5377 172.854 0.2163791 0.0 0.0 1.0 0.002745884
R_rect_00: 0.9999239 0.00983776 -0.007445048 -0.0098698 0.9999421 -0.004278459 0.007402527 0.004351614 0.9999631
Tr_velo_to_cam: 0.007533745 -0.9999714 -0.000616602 -0.004069766 0.01480249 0.0007280733 -0.9998902 -0.07631618 0.9998621 0.00752379 0.01480755 -0.2717806
"""


@pytest.fixture
def proj(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TEXT)
    return Projection(read_calib_file(str(p)), camera=2)


def test_velo_rect_roundtrip(proj):
    rng = np.random.RandomState(0)
    velo = rng.uniform(-20, 20, (100, 3))
    velo[:, 0] = np.abs(velo[:, 0]) + 5  # in front of the car
    rect = proj.velo_to_rect(velo)
    back = proj.rect_to_velo(rect)
    np.testing.assert_allclose(back, velo, atol=1e-9)


def test_depth_rect_image_roundtrip(proj):
    """depth map -> 3D rect points -> image plane must land back on the
    source pixels with the source depths (exact inverse incl. P[:, 3])."""
    h, w = 40, 60
    rng = np.random.RandomState(1)
    depth = np.zeros((h, w), np.float32)
    ys, xs = rng.randint(5, h - 5, 50), rng.randint(5, w - 5, 50)
    depth[ys, xs] = rng.uniform(5, 50, 50).astype(np.float32)

    points, color = proj.depth_to_rect(depth)
    assert color is None
    v, u = np.where(depth > 0)
    np.testing.assert_allclose(points[:, 2], depth[v, u], rtol=1e-6)
    uv = proj.rect_to_image(points)
    np.testing.assert_allclose(uv[:, 0], u, atol=1e-4)
    np.testing.assert_allclose(uv[:, 1], v, atol=1e-4)


def test_depth_to_rect_with_color(proj):
    h, w = 16, 24
    depth = np.zeros((h, w), np.float32)
    depth[4, 7] = 10.0
    img = np.arange(h * w * 3).reshape(h, w, 3)
    points, color = proj.depth_to_rect(depth, img)
    assert points.shape == (1, 3)
    np.testing.assert_array_equal(color[0], img[4, 7])


def test_depth_to_velo_roundtrip_through_depth_map(proj):
    """velo scan -> depth map -> velo points must reproduce the (visible)
    source points."""
    rng = np.random.RandomState(2)
    h, w = 375, 1242  # KITTI image size matching the calib intrinsics
    velo = rng.uniform(-3, 3, (30, 3))
    velo[:, 0] = rng.uniform(8, 30, 30)  # forward
    depth = proj.velo_to_depth_map(velo, (h, w))
    back = proj.depth_to_velo(depth)
    assert len(back) >= 25  # nearly all points visible
    # every recovered point must be near SOME source point (pixel rounding
    # in the depth-map rasterization perturbs coordinates)
    d = np.linalg.norm(back[:, None] - velo[None], axis=-1).min(axis=1)
    assert d.max() < 0.5


def test_eth3d_per_scene_calib(tmp_path):
    from temporalstereo_tpu.data.datasets.extra_formats import (
        read_eth3d_intrinsic,
    )

    cam = tmp_path / "cameras.txt"
    cam.write_text(
        "# Camera list with one line of data per camera\n"
        "0 PINHOLE 941 490 542.019 542.019 541.922 255.202\n")
    K, (h, w) = read_eth3d_intrinsic(str(cam))
    assert (h, w) == (490, 941)
    np.testing.assert_allclose(
        K, [[542.019, 0, 541.922], [0, 542.019, 255.202], [0, 0, 1]])


def test_eth3d_dataset_uses_per_scene_calib(tmp_path):
    import json

    from PIL import Image

    from temporalstereo_tpu.data.formats import write_pfm
    from temporalstereo_tpu.data.datasets.extra_formats import ETH3DDataset

    h, w = 32, 64
    rng = np.random.RandomState(3)
    for name in ("l.png", "r.png"):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            tmp_path / name)
    write_pfm(str(tmp_path / "d.pfm"),
              rng.uniform(1, 10, (h, w)).astype(np.float32))
    (tmp_path / "cameras.txt").write_text(
        f"0 PINHOLE {w} {h} 100.0 100.0 {w / 2} {h / 2}\n")
    items = [{"0": {"left_image_path": "l.png", "right_image_path": "r.png",
                    "left_disp_path": "d.pfm"},
              "intrinsic_path": "cameras.txt"}]
    (tmp_path / "ann.json").write_text(json.dumps(items))

    ds = ETH3DDataset(str(tmp_path / "ann.json"), str(tmp_path), h, w, [0],
                      is_train=False)
    sample = ds[0]
    # per-scene focal 100 survives into the sample K (no resize: h, w match)
    np.testing.assert_allclose(sample["K"][0, 0], 100.0, rtol=1e-6)
    np.testing.assert_allclose(sample["K"][0, 2], w / 2, rtol=1e-6)
