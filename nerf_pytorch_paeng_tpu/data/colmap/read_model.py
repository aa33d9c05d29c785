"""Parser for COLMAP's binary sparse-model files (cameras/images/points3D).

Capability parity target: reference dataset/colmap/colmap_read_model.py
(read_cameras_binary:109, read_images_binary:169, read_points3d_binary:231)
— re-implemented from the COLMAP binary format spec with plain dataclasses
and numpy (no torch).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, Dict

import numpy as np

# camera model id -> (name, #params), per COLMAP src/base/camera_models.h
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class Image:
    id: int
    qvec: np.ndarray       # [4] (w, x, y, z)
    tvec: np.ndarray       # [3]
    camera_id: int
    name: str
    xys: np.ndarray        # [P, 2]
    point3D_ids: np.ndarray  # [P] int64 (-1 = no 3D point)


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray        # [3]
    rgb: np.ndarray        # [3] uint8
    error: float
    image_ids: np.ndarray  # [T] int32
    point2D_idxs: np.ndarray  # [T] int32


def _read(fp: BinaryIO, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, fp.read(size))


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def read_cameras_binary(path: str) -> Dict[int, Camera]:
    cams: Dict[int, Camera] = {}
    with open(path, "rb") as fp:
        (n,) = _read(fp, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(fp, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(fp, f"<{n_params}d"))
            cams[cam_id] = Camera(cam_id, name, int(width), int(height),
                                  params)
    return cams


def read_images_binary(path: str) -> Dict[int, Image]:
    images: Dict[int, Image] = {}
    with open(path, "rb") as fp:
        (n,) = _read(fp, "<Q")
        for _ in range(n):
            image_id = _read(fp, "<i")[0]
            qvec = np.array(_read(fp, "<4d"))
            tvec = np.array(_read(fp, "<3d"))
            camera_id = _read(fp, "<i")[0]
            name_bytes = b""
            while True:
                c = fp.read(1)
                if c == b"\x00":
                    break
                name_bytes += c
            (n_pts,) = _read(fp, "<Q")
            data = np.frombuffer(fp.read(24 * n_pts),
                                 dtype=[("x", "<f8"), ("y", "<f8"),
                                        ("id", "<i8")])
            images[image_id] = Image(
                image_id, qvec, tvec, camera_id, name_bytes.decode("utf-8"),
                np.stack([data["x"], data["y"]], -1) if n_pts else
                np.zeros((0, 2)),
                data["id"].astype(np.int64))
    return images


def read_points3d_binary(path: str) -> Dict[int, Point3D]:
    points: Dict[int, Point3D] = {}
    with open(path, "rb") as fp:
        (n,) = _read(fp, "<Q")
        for _ in range(n):
            pid = _read(fp, "<Q")[0]
            xyz = np.array(_read(fp, "<3d"))
            rgb = np.array(_read(fp, "<3B"), np.uint8)
            (error,) = _read(fp, "<d")
            (track_len,) = _read(fp, "<Q")
            track = np.frombuffer(fp.read(8 * track_len),
                                  dtype=[("im", "<i4"), ("pt", "<i4")])
            points[pid] = Point3D(pid, xyz, rgb, float(error),
                                  track["im"].astype(np.int32),
                                  track["pt"].astype(np.int32))
    return points
