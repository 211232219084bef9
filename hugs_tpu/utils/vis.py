"""Visualization exports (reference hugs/utils/vis.py equivalents).

save_human_ply: canonical human Gaussians -> 3DGS-format PLY
(reference save_ply, vis.py:41-60: linear scales -> log, rotmat -> quat).
Ellipsoid/skeleton mesh exports are provided as simple OBJ writers (the
reference used open3d/trimesh, absent here).
"""
from __future__ import annotations

import os

import numpy as np

from hugs_tpu.utils.ply import save_gaussian_ply


def save_human_ply(human_gs_out: dict, path: str):
    """Export the CANONICAL human Gaussians from a forward-output dict."""
    alive = np.asarray(human_gs_out.get(
        "alive", np.ones(np.asarray(human_gs_out["xyz_canon"]).shape[0],
                         bool)))
    xyz = np.asarray(human_gs_out["xyz_canon"])[alive]
    shs = np.asarray(human_gs_out["shs"])[alive]          # (N, 16, 3)
    opacity = np.asarray(human_gs_out["opacity"]).reshape(-1, 1)[alive]
    scales = np.asarray(human_gs_out["scales_canon"])[alive]
    rotq = np.asarray(human_gs_out["rotq_canon"])[alive]

    def logit(p):
        p = np.clip(p, 1e-6, 1 - 1e-6)
        return np.log(p / (1 - p))

    save_gaussian_ply(
        path, xyz,
        features_dc=shs[:, :1, :],
        features_rest=shs[:, 1:, :],
        opacity=logit(opacity),
        scaling=np.log(np.clip(scales, 1e-9, None)),
        rotation=rotq)


def save_skeleton_obj(joints: np.ndarray, parents, path: str):
    """Joint skeleton as an OBJ line set (reference draw_skeleton
    analog, vis.py:233-285)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for j in np.asarray(joints):
            f.write(f"v {j[0]} {j[1]} {j[2]}\n")
        for i, p in enumerate(parents):
            if p >= 0:
                f.write(f"l {p + 1} {i + 1}\n")


def save_ellipsoids_obj(xyz, scales, rotmats, path: str, n_seg: int = 6,
                        max_points: int = 2000):
    """Gaussian ellipsoids as low-res OBJ meshes (reference
    get_ellips_meshes analog, vis.py:122-163)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    xyz = np.asarray(xyz)[:max_points]
    scales = np.asarray(scales)[:max_points]
    rotmats = np.asarray(rotmats)[:max_points]
    us = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    vs = np.linspace(0, np.pi, n_seg)
    sphere = np.stack(np.meshgrid(us, vs), -1).reshape(-1, 2)
    unit = np.stack([np.cos(sphere[:, 0]) * np.sin(sphere[:, 1]),
                     np.sin(sphere[:, 0]) * np.sin(sphere[:, 1]),
                     np.cos(sphere[:, 1])], axis=1)
    with open(path, "w") as f:
        for c, s, R in zip(xyz, scales, rotmats):
            pts = (unit * s) @ R.T + c
            for p in pts:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")
