"""End-to-end CPU tests for the offline inference CLIs (kitti_submission,
demo) — the reference's projects/TemporalStereo/kitti_submission.py and
demo.py surfaces (SURVEY §3.4)."""
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

from temporalstereo_tpu.data.formats import write_pfm


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sf_cli")
    h, w = 64, 96
    rng = np.random.RandomState(0)
    items = []
    for idx in range(2):
        item = {}
        for fi in [0]:
            lp, rp, dp = (f"L_{idx}_{fi}.png", f"R_{idx}_{fi}.png",
                          f"D_{idx}_{fi}.pfm")
            for pth in (lp, rp):
                Image.fromarray((rng.rand(h, w, 3) * 255).astype(
                    np.uint8)).save(root / pth)
            write_pfm(str(root / dp),
                      rng.uniform(1, 20, (h, w)).astype(np.float32))
            item[str(fi)] = {"left_image_path": lp, "right_image_path": rp,
                             "left_disp_path": dp}
        items.append(item)
    (root / "ann.json").write_text(json.dumps(items))
    return str(root)


def _opts(root):
    opts = [
        "TRAINER.PRECISION", "f32",
        "MODEL.BACKBONE.VARIANT", "tiny",
        "MODEL.AGGREGATION.COARSE.C", "8",
        "MODEL.AGGREGATION.FINE.C", "8",
        "MODEL.AGGREGATION.PRECISE.C", "8",
    ]
    for phase in ("TRAIN", "VAL", "TEST"):
        opts += [
            f"DATA.{phase}.DATA_ROOT", root,
            f"DATA.{phase}.ANNFILE", os.path.join(root, "ann.json"),
            f"DATA.{phase}.TYPE", "SceneFlow",
            f"DATA.{phase}.HEIGHT", "32",
            f"DATA.{phase}.WIDTH", "64",
            f"DATA.{phase}.FRAME_IDXS", "[0]",
        ]
    return opts


def test_kitti_submission_cli(fake_root, tmp_path, monkeypatch):
    from temporalstereo_tpu.cli import kitti_submission

    out = tmp_path / "disp_0"
    monkeypatch.setattr(sys, "argv", [
        "kitti_submission", "--config-file", "configs/sceneflow.yaml",
        "--output-dir", str(out), *_opts(fake_root)])
    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    kitti_submission.main()
    pngs = sorted(os.listdir(out))
    assert pngs == ["L_0_0.png", "L_1_0.png"]
    disp = np.asarray(Image.open(out / pngs[0]))
    assert disp.dtype == np.uint16 and disp.shape == (32, 64)


def test_video_inference_cli_gt_eval(tmp_path, monkeypatch):
    """Streaming video CLI: per-frame EPE/3PE vs GT + error.txt sequence
    averages (reference video_inference.py:289-293, 312-323)."""
    from temporalstereo_tpu.cli import video_inference
    from temporalstereo_tpu.data.formats import write_kitti_disp

    h, w = 32, 64
    rng = np.random.RandomState(1)
    root = tmp_path / "video"
    for sub in ("left", "right", "disp_gt"):
        os.makedirs(root / sub)
    n_frames = 2
    for i in range(n_frames):
        for sub in ("left", "right"):
            Image.fromarray((rng.rand(h, w, 3) * 255).astype(
                np.uint8)).save(root / sub / f"{i:04d}.png")
        write_kitti_disp(str(root / "disp_gt" / f"{i:04d}.png"),
                         rng.uniform(1, 20, (h, w)).astype(np.float32))

    out = tmp_path / "video_out"
    monkeypatch.setattr(sys, "argv", [
        "video_inference", "--config-file", "configs/sceneflow.yaml",
        "--data-root", str(root), "--log-dir", str(out),
        "--height", str(h), "--width", str(w),
        *_opts(str(root))])
    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    video_inference.main()

    assert sorted(os.listdir(out)) == [
        "0000.png", "0000_color.png", "0001.png", "0001_color.png",
        "error.txt"]
    lines = (out / "error.txt").read_text().strip().splitlines()
    assert len(lines) == n_frames + 1
    for i in range(n_frames):
        idx, epe, perct = lines[i].split()
        assert idx == f"{i:04d}:"
        assert 0.0 <= float(epe) < 192.0
        assert 0.0 <= float(perct) <= 100.0
    assert lines[-1].startswith("Sequence average EPE:")
    avg = np.mean([float(l.split()[1]) for l in lines[:-1]])
    assert abs(float(lines[-1].split()[3].rstrip(",")) - avg) < 1e-3


def test_video_inference_cli_tartanair_poses_gt_resize(tmp_path, monkeypatch):
    """Temporal streaming with TartanAir GT quaternion poses (reference
    video_inference.py:63-98 use_gt branch) + GT at a DIFFERENT resolution
    (evaluate-at-GT-resolution branch, :321-324): poses are auto-sniffed,
    the estimate is rescaled to the GT grid before EPE/3PE."""
    from scipy.spatial.transform import Rotation

    from temporalstereo_tpu.cli import video_inference
    from temporalstereo_tpu.data.formats import write_kitti_disp

    h, w = 64, 64
    gh, gw = 96, 128  # GT resolution differs from inference resolution
    rng = np.random.RandomState(5)
    root = tmp_path / "video_ta"
    for sub in ("left", "right", "disp_gt"):
        os.makedirs(root / sub)
    n_frames = 3
    pose_lines = []
    for i in range(n_frames):
        for sub in ("left", "right"):
            Image.fromarray((rng.rand(h, w, 3) * 255).astype(
                np.uint8)).save(root / sub / f"{i:04d}.png")
        write_kitti_disp(str(root / "disp_gt" / f"{i:04d}.png"),
                         rng.uniform(1, 20, (gh, gw)).astype(np.float32))
        q = Rotation.from_rotvec(np.array([0.0, 0.002 * i, 0.0])).as_quat()
        t = np.array([0.05 * i, 0.0, 0.01 * i])
        pose_lines.append(" ".join(f"{v:.8f}" for v in (*t, *q)))
    (root / "pose_left.txt").write_text("\n".join(pose_lines) + "\n")

    out = tmp_path / "video_ta_out"
    monkeypatch.setattr(sys, "argv", [
        "video_inference", "--config-file", "configs/sceneflow.yaml",
        "--data-root", str(root), "--log-dir", str(out),
        "--height", str(h), "--width", str(w),
        *_opts(str(root)),
        "MODEL.WITH_PREVIOUS", "True", "MODEL.USE_PAST_COST", "True",
        "MODEL.LOCAL_MAP_SIZE", "3", "MODEL.BACKBONE.MEMORY_PERCENT", "0.5",
    ])
    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    video_inference.main()

    lines = (out / "error.txt").read_text().strip().splitlines()
    assert len(lines) == n_frames + 1
    for i in range(n_frames):
        _, epe, perct = lines[i].split()
        assert 0.0 <= float(epe) < 192.0
        assert 0.0 <= float(perct) <= 100.0


def test_demo_cli(fake_root, tmp_path, monkeypatch):
    from temporalstereo_tpu.cli import demo

    out = tmp_path / "demo_out"
    monkeypatch.setattr(sys, "argv", [
        "demo", "--config-file", "configs/sceneflow.yaml",
        "--output-dir", str(out), "--max-samples", "1",
        *_opts(fake_root)])
    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    demo.main()
    files = os.listdir(out)
    assert files, "demo wrote no panels"
