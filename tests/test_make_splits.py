"""make_splits CLI: annfile generation from raw dataset layouts, round-
tripped through the actual datasets (the schema contract of
data/datasets/base.py / reference base.py:189-300)."""
import json
import os
import subprocess
import sys

import numpy as np
from PIL import Image

from temporalstereo_tpu.cli.make_splits import (
    scan_kitti2015,
    scan_sceneflow,
    scan_sequence,
)
from temporalstereo_tpu.data.formats import write_kitti_disp, write_pfm

H, W = 32, 64


def _img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.random.RandomState(0).rand(H, W, 3) * 255).astype(
        np.uint8)).save(path)


def test_sceneflow_split_roundtrip(tmp_path):
    root = str(tmp_path)
    for scene in ("0000", "0001"):
        for f in range(3):
            for side in ("left", "right"):
                _img(os.path.join(root, "frames_cleanpass", "TRAIN", "A",
                                  scene, side, f"{f:04d}.png"))
            d = os.path.join(root, "disparity", "TRAIN", "A", scene, "left",
                             f"{f:04d}.pfm")
            os.makedirs(os.path.dirname(d), exist_ok=True)
            write_pfm(d, np.random.RandomState(1).uniform(
                1, 20, (H, W)).astype(np.float32))

    items = scan_sceneflow(root, "TRAIN", [-1, 0])
    # 3 frames, window [-1, 0] -> 2 windows per scene, 2 scenes
    assert len(items) == 4
    assert set(items[0]) == {"-1", "0"}
    assert items[0]["0"]["left_image_path"].endswith("0001.png")
    assert items[0]["-1"]["left_image_path"].endswith("0000.png")
    assert "left_disp_path" in items[0]["0"]

    # round-trip: the generated annfile feeds the real dataset
    from temporalstereo_tpu.data.datasets.scene_flow import SceneFlowDataset

    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(items))
    ds = SceneFlowDataset(str(ann), root, H, W, [-1, 0], is_train=False)
    sample = ds[0]
    assert sample["left"].shape == (2, H, W, 3)
    assert sample["disp_gt"].shape == (2, H, W, 1)
    assert sample["disp_gt"].max() > 0


def test_kitti2015_split_windows(tmp_path):
    root = str(tmp_path)
    for sid in ("000000", "000001"):
        for ff in (8, 9, 10):
            for cam in ("image_2", "image_3"):
                _img(os.path.join(root, "training", cam,
                                  f"{sid}_{ff:02d}.png"))
        gt = os.path.join(root, "training", "disp_occ_0", f"{sid}_10.png")
        os.makedirs(os.path.dirname(gt), exist_ok=True)
        write_kitti_disp(gt, np.random.RandomState(2).uniform(
            1, 20, (H, W)).astype(np.float32))

    items = scan_kitti2015(root, "training", [-2, -1, 0])
    assert len(items) == 2
    assert items[0]["0"]["left_image_path"].endswith("000000_10.png")
    assert items[0]["-2"]["left_image_path"].endswith("000000_08.png")
    assert "left_disp_path" in items[0]["0"]
    assert "left_disp_path" not in items[0]["-1"]  # GT only at frame 10

    # windows needing missing frames are dropped
    items11 = scan_kitti2015(root, "training", list(range(-10, 1)))
    assert items11 == []


def test_sequence_split_and_cli(tmp_path):
    root = tmp_path / "seq"
    for sub in ("left", "right", "disp"):
        os.makedirs(root / sub)
    for i in range(4):
        _img(str(root / "left" / f"{i:04d}.png"))
        _img(str(root / "right" / f"{i:04d}.png"))
        write_kitti_disp(str(root / "disp" / f"{i:04d}.png"),
                         np.random.RandomState(3).uniform(
                             1, 9, (H, W)).astype(np.float32))
    (root / "pose_left.txt").write_text(
        "\n".join(" ".join(["1 0 0 0", "0 1 0 0", "0 0 1 0"])
                  for _ in range(4)))

    items = scan_sequence(str(root / "left"), str(root / "right"),
                          str(root / "disp"), str(root / "pose_left.txt"),
                          [-1, 0], root=str(root))
    assert len(items) == 3
    assert items[0]["extrinsic_path"] == "pose_left.txt"
    assert items[2]["0"]["left_disp_path"] == os.path.join("disp",
                                                           "0003.png")

    # the CLI end-to-end
    out = tmp_path / "splits" / "seq.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([
        sys.executable, "-m", "temporalstereo_tpu.cli.make_splits",
        "sequence", "--left-dir", str(root / "left"),
        "--right-dir", str(root / "right"),
        "--disp-dir", str(root / "disp"),
        "--pose-file", str(root / "pose_left.txt"),
        "--data-root", str(root),
        "--frame-idxs", "-1", "0", "--output", str(out)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert json.loads(out.read_text()) == items


def test_frame_idx_range_syntax():
    from temporalstereo_tpu.cli.make_splits import _parse_frame_idxs

    assert _parse_frame_idxs(["-10..0"]) == list(range(-10, 1))
    assert _parse_frame_idxs(["-1", "0"]) == [-1, 0]
