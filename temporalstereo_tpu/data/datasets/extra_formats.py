"""ETH3D and DrivingStereo loaders.

Re-design of reference ``architecture/data/utils/load_eth3d.py`` and
``load_drivingstereo.py``: additional evaluation-dataset format readers kept
in the public API surface (the reference exports them from
data/utils/__init__.py).
"""
from __future__ import annotations

import os

import numpy as np

from ...utils.registry import DATASET_REGISTRY
from ..formats import load_kitti_disp, load_pfm
from .base import StereoDataset


@DATASET_REGISTRY.register(name="ETH3D")
class ETH3DDataset(StereoDataset):
    """ETH3D two-view stereo: PFM disparity, per-scene calib text files."""
    norm_K = np.array([[3408.59 / 6048, 0, 3117.0 / 6048],
                       [0, 3408.59 / 4032, 2064.0 / 4032],
                       [0, 0, 1.0]])
    full_resolution = (4032, 6048)
    baseline = 0.6
    with_depth_gt = False
    with_disp_gt = True
    with_pose_gt = False

    def disp_loader(self, path: str, full_K=None) -> np.ndarray:
        disp, _ = load_pfm(os.path.join(self.root, path))
        disp = np.asarray(disp, np.float32)
        # ETH3D marks invalid with inf
        return np.where(np.isfinite(disp), disp, 0.0)


@DATASET_REGISTRY.register(name="DrivingStereo")
class DrivingStereoDataset(StereoDataset):
    """DrivingStereo: KITTI-style uint16/256 PNG disparity, half-res default."""
    norm_K = np.array([[1003.556 / 1758, 0, 879.0 / 1758],
                       [0, 1003.556 / 800, 400.0 / 800],
                       [0, 0, 1.0]])
    full_resolution = (800, 1758)
    baseline = 0.5443
    with_depth_gt = False
    with_disp_gt = True
    with_pose_gt = False

    def disp_loader(self, path: str, full_K=None) -> np.ndarray:
        return load_kitti_disp(os.path.join(self.root, path))
