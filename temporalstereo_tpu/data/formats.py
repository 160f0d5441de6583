"""Disparity / depth / flow / pose format readers & writers (numpy + PIL).

TPU-native re-design of reference ``architecture/data/utils/``:
  * PFM read/write (load_disparity.py:5-53)
  * KITTI uint16/256 PNG disparity + depth (load_kitti.py)
  * SceneFlow pfm disparity -> depth (load_scene_flow.py:48-62)
  * TartanAir npy depth + NED quaternion poses (load_tartanair.py:16-52)
  * VKITTI2 cm PNG depth + per-frame pose text (load_vkitti.py)
  * optical-flow formats .flo / KITTI png (load_flow.py)
  * ORB-SLAM3 cam-to-world pose files, inverted on load (load_kitti.py:37-62)
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image


# ------------------------------------------------------------------- PFM --

def load_pfm(path: str) -> Tuple[np.ndarray, float]:
    """Read a PFM file -> (array [H, W] or [H, W, 3], scale).

    Uses the native decoder (native/tsnative.cpp) when available."""
    from . import native

    if native.available():
        with open(path, "rb") as f:
            buf = f.read()
        try:
            return native.decode_pfm(buf)
        except ValueError:
            pass  # fall through to the python parser
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline().decode("latin-1")
        m = re.match(r"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"malformed PFM header in {path}")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    data = data.reshape(shape)
    data = np.flipud(data)  # PFM stores bottom-up
    return np.ascontiguousarray(data, dtype=np.float32), abs(scale)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.asarray(image, dtype=np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(image).tofile(f)


# --------------------------------------------------------------- KITTI --

def _load_png16(path: str) -> np.ndarray:
    """uint16 PNG via the native zlib decoder, PIL fallback."""
    from .native import available, decode_png

    if available():
        with open(path, "rb") as f:
            raw = decode_png(f.read())
        if raw is not None:
            return raw.astype(np.float32)
    return np.asarray(Image.open(path), dtype=np.float32)


def load_kitti_disp(path: str) -> np.ndarray:
    """KITTI uint16 PNG disparity (value/256, 0 = invalid)."""
    return _load_png16(path) / 256.0


def write_kitti_disp(path: str, disp: np.ndarray) -> None:
    """uint16 PNG for the KITTI submission server
    (kitti_submission.py:114-116)."""
    out = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    # Pillow infers I;16 from the uint16 dtype; the explicit mode= arg is
    # deprecated (removal in Pillow 13)
    Image.fromarray(out).save(path)


def load_kitti_depth(path: str) -> np.ndarray:
    return _load_png16(path) / 256.0


def load_disparity(path: str) -> np.ndarray:
    """Generic disparity reader dispatching on extension (the reference's
    read_disparity, video_inference.py:41-60): .pfm (SceneFlow), uint16 .png
    (KITTI), .npy."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pfm":
        disp, _ = load_pfm(path)
        return np.ascontiguousarray(disp).astype(np.float32)
    if ext == ".png":
        return load_kitti_disp(path)
    if ext == ".npy":
        return np.load(path).astype(np.float32)
    raise ValueError(f"unsupported disparity format: {path}")


# ---------------------------------------------------------- SceneFlow --

def sceneflow_disp_to_depth(disp: np.ndarray, focal: float = 1050.0,
                            baseline: float = 1.0) -> np.ndarray:
    """reference load_scene_flow.py:48-62 (depth = f*b / disp)."""
    return focal * baseline / np.maximum(disp, 1e-6)


# ---------------------------------------------------------- TartanAir --

def load_npy_depth(path: str, scale: float = 100.0) -> np.ndarray:
    """TartanAir .npy depth; the reference divides by 100
    (load_tartanair.py)."""
    return np.load(path).astype(np.float32) / scale


def tartanair_pose_to_matrix(pose_line: np.ndarray) -> np.ndarray:
    """TartanAir GT pose (x y z qx qy qz qw in NED) -> 4x4 cam-to-world with
    the NED -> camera axis correction (load_tartanair.py:16-52)."""
    from scipy.spatial.transform import Rotation

    t = pose_line[:3]
    q = pose_line[3:7]
    R = Rotation.from_quat(q).as_matrix()
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = t
    # NED (x fwd, y right, z down) -> camera (x right, y down, z fwd)
    ned2cam = np.array([[0, 1, 0, 0],
                        [0, 0, 1, 0],
                        [1, 0, 0, 0],
                        [0, 0, 0, 1]], dtype=np.float64)
    return (ned2cam @ T @ ned2cam.T).astype(np.float32)


# ------------------------------------------------------------- VKITTI --

def load_vkitti_depth(path: str) -> np.ndarray:
    """VKITTI2 PNG depth in centimetres -> metres (load_vkitti.py)."""
    return _load_png16(path) / 100.0


# --------------------------------------------------------------- Flow --

def load_flo(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)[0]
        assert magic == 202021.25, f"bad .flo magic in {path}"
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    """Middlebury .flo writer (reference write_flo, load_flow.py:107-136):
    f32 magic 202021.25, int32 width/height, interleaved u/v rows."""
    assert flow.ndim == 3 and flow.shape[2] == 2, flow.shape
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([202021.25], np.float32).tofile(f)
        np.array(w, np.int32).tofile(f)
        np.array(h, np.int32).tofile(f)
        flow.astype(np.float32).reshape(h, w * 2).tofile(f)


def load_kitti_flow(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI png flow: (value-2^15)/64, third channel = valid mask."""
    from .native import available, decode_png

    raw = None
    if available():
        with open(path, "rb") as f:
            raw = decode_png(f.read())
    if raw is None or raw.ndim != 3 or raw.shape[-1] < 3:
        raw = np.asarray(Image.open(path), dtype=np.float32)
    else:
        raw = raw.astype(np.float32)
    flow = (raw[..., :2] - 2 ** 15) / 64.0
    valid = raw[..., 2] > 0
    return flow, valid


# -------------------------------------------------------------- Poses --

def load_pose_file(path: str, invert: bool = True) -> np.ndarray:
    """Load an ORB-SLAM3 / KITTI-odometry style pose file: one row of 12 or 16
    floats per frame, cam-to-world; returns [N, 4, 4] world-to-cam when
    ``invert`` (reference load_kitti.py:37-62)."""
    rows = []
    with open(path, "r") as f:
        for line in f:
            vals = [float(v) for v in line.split()]
            if not vals:
                continue
            if len(vals) in (13, 17):  # leading timestamp
                vals = vals[1:]
            mat = np.eye(4, dtype=np.float64)
            if len(vals) == 12:
                mat[:3, :] = np.array(vals).reshape(3, 4)
            elif len(vals) == 16:
                mat = np.array(vals).reshape(4, 4)
            else:
                raise ValueError(f"unsupported pose row of {len(vals)} values")
            rows.append(mat)
    poses = np.stack(rows).astype(np.float64)
    if invert:
        poses = np.linalg.inv(poses)
    return poses.astype(np.float32)


def load_sceneflow_camera_data(path: str) -> dict:
    """SceneFlow ``camera_data.txt``: repeating blocks ``Frame N`` /
    ``L <16 floats>`` / ``R <16 floats>`` [/ blank].  Matrices are stored
    world->cam directly (reference read_sceneflow_extrinsic,
    load_scene_flow.py:7-45).  Returns {frame_id: {side: (T, inv_T)}}."""
    data: dict = {}
    frame = None
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "Frame":
                frame = int(parts[1])
                data[frame] = {}
            elif parts[0] in ("L", "R") and frame is not None:
                T = np.array([float(v) for v in parts[1:]],
                             np.float64).reshape(4, 4)
                data[frame][parts[0].lower()] = (
                    T.astype(np.float32),
                    np.linalg.pinv(T).astype(np.float32))
    return data


def load_tartanair_pose_file(path: str) -> np.ndarray:
    """TartanAir GT pose file: one ``x y z qx qy qz qw`` row per frame (NED
    axes, cam-to-world); returns [N, 4, 4] world-to-cam in camera axes.

    Matches the reference's read_tartanair_extrinsic (load_tartanair.py:
    16-52) up to the world-frame convention: the reference left-multiplies
    the NED->camera permutation C (world stays NED), this loader conjugates
    (C T C^T, world in camera axes).  Relative poses T_t @ inv(T_{t-1}) —
    the only quantity the temporal model consumes (TemporalStereo.py:
    335-338) — are identical because C is orthogonal and conjugation
    cancels."""
    rows = []
    with open(path, "r") as f:
        for line in f:
            vals = [float(v) for v in line.split()]
            if not vals:
                continue
            if len(vals) != 7:
                raise ValueError(
                    f"TartanAir pose rows have 7 values, got {len(vals)}")
            c2w = tartanair_pose_to_matrix(np.asarray(vals, np.float64))
            rows.append(np.linalg.inv(c2w.astype(np.float64)))
    return np.stack(rows).astype(np.float32)


def sniff_pose_format(path: str) -> str:
    """'tartanair' (7-value quaternion rows) or 'matrix' (ORB-SLAM3 /
    KITTI-odometry 12/16-value rows) — the dispatch the reference hard-codes
    with a use_gt flag (video_inference.py:63-98, :244)."""
    with open(path, "r") as f:
        for line in f:
            n = len(line.split())
            if n == 0:
                continue
            return "tartanair" if n == 7 else "matrix"
    raise ValueError(f"empty pose file: {path}")


def load_image(path: str) -> np.ndarray:
    """RGB image in [0, 1] float32, [H, W, 3]."""
    if path.lower().endswith(".png"):
        from .native import available, decode_png

        if available():
            with open(path, "rb") as f:
                raw = decode_png(f.read())
            if raw is not None and raw.dtype == np.uint8:
                if raw.ndim == 2:
                    raw = raw[..., None]
                if raw.shape[-1] < 3:  # gray / gray+alpha -> RGB
                    raw = np.repeat(raw[..., :1], 3, axis=-1)
                return raw[..., :3].astype(np.float32) / 255.0
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0
