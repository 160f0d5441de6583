"""Stereo video dataset base: annfile index -> time-major numpy samples.

TPU-native re-design of reference ``architecture/data/datasets/base.py``
(StereoDatasetBase :1-323).  Keeps the reference's **annfile JSON format**
(a list of items: ``item[str(frame_idx)] = {left_image_path, ...}``,
``item['extrinsic_path']``, optional ``item['intrinsic_path']``) so existing
split files work unchanged.

Output sample (numpy, time-major; collated to the batch pytree consumed by
models/temporal.py):
  left / right   [T, H, W, 3] normalized float32
  disp_gt        [T, H, W, 1]  (0 where unavailable)
  disp_gt_right  [T, H, W, 1]  (only when the split provides it)
  T_cam / inv_T  [T, 4, 4]     world->cam for the left camera
  K              [3, 3]        intrinsics at the processed resolution
  baseline       scalar
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import transforms as T
from ..formats import load_image


class StereoDataset:
    """Base dataset; subclasses provide format-specific loaders."""

    # subclass defaults (normalized intrinsics rows /w, /h — reference
    # scene_flow/base.py:15-24 convention)
    norm_K: np.ndarray = np.eye(3, dtype=np.float64)
    full_resolution: Tuple[int, int] = (540, 960)
    baseline: float = 1.0
    with_depth_gt = False
    with_disp_gt = True
    with_pose_gt = True

    def __init__(self, annfile: str, root: str, height: int, width: int,
                 frame_idxs: Sequence[int], is_train: bool = False,
                 use_common_intrinsics: bool = False,
                 do_same_lr_transform: bool = True,
                 mean=T.IMAGENET_MEAN, std=T.IMAGENET_STD, seed: int = 43):
        self.root = root
        self.annfile = annfile
        self.height = height
        self.width = width
        self.frame_idxs = sorted(frame_idxs)
        self.is_train = is_train
        self.use_common_intrinsics = use_common_intrinsics
        self.do_same_lr_transform = do_same_lr_transform
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.rng = np.random.RandomState(seed)
        self.data_list = self._load_annfile()

    def _load_annfile(self) -> List[Dict]:
        with open(self.annfile, "r") as fp:
            return list(json.load(fp))

    def __len__(self) -> int:
        return len(self.data_list)

    # ------------------------------------------------ subclass interface --
    def image_loader(self, path: str) -> np.ndarray:
        return load_image(os.path.join(self.root, path))

    def disp_loader(self, path: str, full_K=None) -> np.ndarray:
        raise NotImplementedError

    def depth_loader(self, path: str, full_K=None) -> np.ndarray:
        raise NotImplementedError

    def extrinsic_loader(self, path: str):
        """Return opaque pose data passed to get_extrinsic."""
        raise NotImplementedError

    def get_extrinsic(self, extrinsics, image_path: str) -> np.ndarray:
        """-> [4, 4] world->cam for the left camera of this frame."""
        raise NotImplementedError

    def intrinsic_loader(self, intrinsic_path: str):
        """-> (norm_K [3,3] rows /w,/h, full_K [3,3], (h, w))."""
        h, w = self.full_resolution
        full_K = self.norm_K.copy()
        full_K[0, :] *= w
        full_K[1, :] *= h
        return self.norm_K.copy(), full_K, self.full_resolution

    def depth_to_disp(self, depth: np.ndarray, full_K: np.ndarray
                      ) -> np.ndarray:
        focal = full_K[0, 0]
        return np.where(depth > 1e-6,
                        self.baseline * focal / np.maximum(depth, 1e-6),
                        0.0).astype(np.float32)

    # ------------------------------------------------------------ sample --
    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self._get(idx, self.rng)

    def getitem_seeded(self, idx: int, seed: int) -> Dict[str, np.ndarray]:
        """Sample with augmentation draws from a fresh ``RandomState(seed)``:
        the sample is a pure function of ``(idx, seed)``.  The DataLoader
        derives the seed from (loader seed, epoch, DATASET index), so an
        epoch's augmented samples are identical across host counts, batch
        sizes and worker models — stronger than torch's per-worker seeding
        (reference relies on torch DataLoader worker_init, no such
        invariance).  Also thread-safe: no shared ``self.rng`` mutation."""
        return self._get(idx, np.random.RandomState(seed & 0x7FFFFFFF))

    def _get(self, idx: int, rng: np.random.RandomState
             ) -> Dict[str, np.ndarray]:
        item = self.data_list[idx]

        if "intrinsic_path" in item:
            norm_K, full_K, res = self.intrinsic_loader(item["intrinsic_path"])
        else:
            norm_K, full_K, res = self.intrinsic_loader(
                item["0"]["left_image_path"])

        extrinsics = None
        if self.with_pose_gt and "extrinsic_path" in item:
            extrinsics = self.extrinsic_loader(item["extrinsic_path"])

        lefts, rights, disps, disps_r, poses = [], [], [], [], []
        has_right_disp = False
        for frame_idx in self.frame_idxs:
            cur = item[str(frame_idx)]
            lefts.append(self.image_loader(cur["left_image_path"]))
            rights.append(self.image_loader(cur["right_image_path"]))

            disp = None
            disp_r = None
            if self.with_disp_gt and "left_disp_path" in cur:
                disp = self.disp_loader(cur["left_disp_path"], full_K)
            elif self.with_depth_gt and "left_depth_path" in cur:
                depth = self.depth_loader(cur["left_depth_path"], full_K)
                disp = self.depth_to_disp(depth, full_K)
            if self.with_disp_gt and "right_disp_path" in cur:
                disp_r = self.disp_loader(cur["right_disp_path"], full_K)
                has_right_disp = True
            elif self.with_depth_gt and "right_depth_path" in cur:
                depth = self.depth_loader(cur["right_depth_path"], full_K)
                disp_r = self.depth_to_disp(depth, full_K)
                has_right_disp = True
            h, w = lefts[-1].shape[:2]
            disps.append(disp if disp is not None
                         else np.zeros((h, w), np.float32))
            disps_r.append(disp_r if disp_r is not None
                           else np.zeros((h, w), np.float32))

            if extrinsics is not None:
                poses.append(self.get_extrinsic(extrinsics,
                                                cur["left_image_path"]))
            else:
                poses.append(np.eye(4, dtype=np.float32))

        sample = self._transform(lefts, rights, disps,
                                 disps_r if has_right_disp else None,
                                 norm_K, rng)
        T_cam = np.stack(poses).astype(np.float32)
        sample["T_cam"] = T_cam
        sample["inv_T"] = np.linalg.inv(T_cam).astype(np.float32)
        sample["baseline"] = np.float32(self.baseline)
        return sample

    # --------------------------------------------------------- transform --
    def _transform(self, lefts, rights, disps, disps_r, norm_K, rng=None):
        if rng is None:
            rng = self.rng
        ih, iw = lefts[0].shape[:2]
        th, tw = self.height, self.width

        # intrinsics at source resolution
        K = norm_K.copy().astype(np.float64)
        K[0, :] *= iw
        K[1, :] *= ih

        if self.is_train:
            # random crop (base.py:137-155); K shifts by the crop offset
            y, x = T.random_crop_params(rng, ih, iw, th, tw)
            lefts = [T.crop(a, y, x, th, tw) for a in lefts]
            rights = [T.crop(a, y, x, th, tw) for a in rights]
            disps = [T.crop(a, y, x, th, tw) for a in disps]
            if disps_r is not None:
                disps_r = [T.crop(a, y, x, th, tw) for a in disps_r]
            K = T.crop_intrinsics(K, y, x)

            # photometric aug, 50% probability (base.py:73-97)
            if rng.rand() < 0.5:
                if self.do_same_lr_transform:
                    seed = rng.randint(0, 2 ** 31)
                    lefts = [T.color_jitter(a, np.random.RandomState(seed))
                             for a in lefts]
                    rights = [T.color_jitter(a, np.random.RandomState(seed))
                              for a in rights]
                else:
                    lefts = [T.color_jitter(a, rng) for a in lefts]
                    rights = [T.color_jitter(a, rng) for a in rights]

            # right-view occlusion patches (base.py:158-173)
            rights = [T.right_occlusion_aug(a, rng) for a in rights]
        else:
            if (ih, iw) != (th, tw):
                # eval: only the IMAGES are resized to the model size; gt
                # disparities stay at NATIVE resolution and predictions are
                # resized back for metrics — the reference protocol
                # (base.py:177-185 resizes color_aug only;
                # validation_step :174-183 interpolates outputs to gt size)
                sx, sy = tw / iw, th / ih
                lefts = [T.resize_image(a, (th, tw)) for a in lefts]
                rights = [T.resize_image(a, (th, tw)) for a in rights]
                K = T.scale_intrinsics(K, sx, sy)

        sample = {
            "left": np.stack([T.normalize(a, self.mean, self.std)
                              for a in lefts]),
            "right": np.stack([T.normalize(a, self.mean, self.std)
                               for a in rights]),
            "disp_gt": np.stack(disps)[..., None].astype(np.float32),
            "K": K.astype(np.float32),
        }
        if disps_r is not None:
            sample["disp_gt_right"] = np.stack(disps_r)[..., None].astype(
                np.float32)
        return sample
