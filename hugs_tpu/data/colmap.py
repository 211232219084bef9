"""COLMAP ASCII scene ingestion.

Minimal reimplementation of the vendored ColmapAsciiReader behavior
(hugs/datasets/neuman_utils/colmap_helper.py:22-149): parse cameras.txt
(PINHOLE/SIMPLE_PINHOLE), images.txt (quaternion+translation extrinsics,
one pose line + one keypoint line per image), and points3D.txt (sparse
point cloud with colors). Returns plain numpy structures.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class ColmapCamera(NamedTuple):
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float


class ColmapImage(NamedTuple):
    name: str
    camera_id: int
    R: np.ndarray   # (3, 3) world->cam rotation
    t: np.ndarray   # (3,)


class ColmapScene(NamedTuple):
    cameras: dict          # id -> ColmapCamera
    images: list           # sorted by name
    points: np.ndarray     # (N, 3)
    colors: np.ndarray     # (N, 3) in [0, 1]


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def read_cameras_txt(path: str) -> dict:
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            w, h = int(parts[2]), int(parts[3])
            p = [float(x) for x in parts[4:]]
            if model == "SIMPLE_PINHOLE":
                fx = fy = p[0]
                cx, cy = p[1], p[2]
            elif model == "PINHOLE":
                fx, fy, cx, cy = p[:4]
            elif model in ("SIMPLE_RADIAL", "RADIAL"):
                # ignore distortion (reference's reader requires
                # undistorted input; accept with a warning-free fallback)
                fx = fy = p[0]
                cx, cy = p[1], p[2]
            else:
                raise ValueError(f"unsupported camera model {model}")
            cams[cam_id] = ColmapCamera(w, h, fx, fy, cx, cy)
    return cams


def read_images_txt(path: str) -> list:
    from hugs_tpu.data import native
    res = native.parse_images(path)
    if res is not None:
        quat, trans, cam_ids, names = res
        images = [ColmapImage(name=nm, camera_id=int(cid),
                              R=_quat_to_rot(q), t=t.astype(np.float32))
                  for q, t, cid, nm in zip(quat, trans, cam_ids, names)]
        images.sort(key=lambda im: im.name)
        return images
    images = []
    with open(path) as f:
        lines = [ln for ln in f if not ln.startswith("#")]
    # pose lines alternate with 2D-point lines
    for ln in lines[0::2]:
        parts = ln.split()
        if len(parts) < 10:
            continue
        q = np.array([float(x) for x in parts[1:5]])
        t = np.array([float(x) for x in parts[5:8]], np.float32)
        cam_id = int(parts[8])
        name = parts[9]
        images.append(ColmapImage(name=name, camera_id=cam_id,
                                  R=_quat_to_rot(q), t=t))
    images.sort(key=lambda im: im.name)
    return images


def read_points3d_txt(path: str):
    from hugs_tpu.data import native
    res = native.parse_points3d(path)
    if res is not None:
        return res
    pts, cols = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            pts.append([float(x) for x in parts[1:4]])
            cols.append([float(x) / 255.0 for x in parts[4:7]])
    return (np.asarray(pts, np.float32),
            np.asarray(cols, np.float32))


def read_colmap_scene(sparse_dir: str) -> ColmapScene:
    cams = read_cameras_txt(os.path.join(sparse_dir, "cameras.txt"))
    images = read_images_txt(os.path.join(sparse_dir, "images.txt"))
    points, colors = read_points3d_txt(
        os.path.join(sparse_dir, "points3D.txt"))
    return ColmapScene(cameras=cams, images=images, points=points,
                       colors=colors)
