"""KITTI 2015 / KITTI raw stereo-video datasets.

Re-design of reference ``architecture/data/datasets/kitti/`` (base.py:1-27,
kitti2015.py:1-67, kittiraw.py:1-86): uint16/256 PNG disparity, calib-file
intrinsics, ORB-SLAM3 pose files (cam-to-world rows, inverted on load),
baseline 0.54, native 375x1242.
"""
from __future__ import annotations

import os

import numpy as np

from ...utils.registry import DATASET_REGISTRY
from ..calibration import read_calib_file
from ..formats import load_kitti_disp, load_pose_file
from .base import StereoDataset


@DATASET_REGISTRY.register(name="KITTI2015")
class KITTI2015Dataset(StereoDataset):
    norm_K = np.array([[721.5377 / 1242, 0, 609.5593 / 1242],
                       [0, 721.5377 / 375, 172.854 / 375],
                       [0, 0, 1.0]])
    full_resolution = (375, 1242)
    baseline = 0.54
    with_depth_gt = False
    with_disp_gt = True
    with_pose_gt = True

    def disp_loader(self, path: str, full_K=None) -> np.ndarray:
        return load_kitti_disp(os.path.join(self.root, path))

    def intrinsic_loader(self, intrinsic_path: str):
        """Per-scene calib file when given (reference kitti2015.py:56-65);
        falls back to the nominal KITTI intrinsics."""
        full = os.path.join(self.root, str(intrinsic_path))
        if str(intrinsic_path).endswith(".txt") and os.path.exists(full):
            data = read_calib_file(full)
            key = "P_rect_02" if "P_rect_02" in data else "P2"
            P = np.asarray(data[key]).reshape(3, 4)
            K = P[:3, :3]
            if "S_rect_02" in data:
                w, h = np.asarray(data["S_rect_02"])
            else:
                h, w = self.full_resolution
            norm_K = K.copy()
            norm_K[0, :] /= w
            norm_K[1, :] /= h
            return norm_K, K, (int(h), int(w))
        return super().intrinsic_loader(intrinsic_path)

    def extrinsic_loader(self, path: str):
        """ORB-SLAM3 poses: rows are cam-to-world, inverted to world->cam
        (reference load_kitti.py:37-62)."""
        return load_pose_file(os.path.join(self.root, path), invert=True)

    def get_extrinsic(self, extrinsics, image_path: str) -> np.ndarray:
        name = os.path.splitext(os.path.basename(image_path))[0]
        # e.g. '000123_10' (kitti2015 multiview) or '0000000042' (raw)
        digits = name.split("_")[-1] if "_" in name else name
        idx = int(digits)
        idx = min(idx, len(extrinsics) - 1)
        return extrinsics[idx]


@DATASET_REGISTRY.register(name="KITTIRAW")
class KITTIRawDataset(KITTI2015Dataset):
    """KITTI raw sequences with pseudo-GT disparity (reference
    kittiraw.py:1-86); pose rows indexed by raw frame number."""

    def get_extrinsic(self, extrinsics, image_path: str) -> np.ndarray:
        idx = int(os.path.splitext(os.path.basename(image_path))[0])
        idx = min(idx, len(extrinsics) - 1)
        return extrinsics[idx]
