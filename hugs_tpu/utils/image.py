"""Image saving helpers (PNG via PIL, side-by-side grids, videos).

Replaces the reference's torchvision.save_image/make_grid usage
(hugs/utils/image.py:48-95, trainer save paths) and create_video
(hugs/utils/general.py:86-92 — ffmpeg subprocess, gated on availability).
"""
from __future__ import annotations

import glob
import os
import shutil
import subprocess

import numpy as np


def _to_uint8_hwc(img: np.ndarray) -> np.ndarray:
    """(3, H, W) or (H, W, 3) float [0,1] -> (H, W, 3) uint8."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] == 3:
        img = img.transpose(1, 2, 0)
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def save_png(img: np.ndarray, path: str):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(_to_uint8_hwc(img)).save(path)


def save_image_grid(images: list, path: str, pad: int = 2,
                    pad_value: int = 255):
    """Horizontal grid of same-height images."""
    arrs = [_to_uint8_hwc(im) for im in images]
    h = max(a.shape[0] for a in arrs)
    cols = []
    for a in arrs:
        if a.shape[0] < h:
            a = np.pad(a, ((0, h - a.shape[0]), (0, 0), (0, 0)),
                       constant_values=pad_value)
        cols.append(a)
        cols.append(np.full((h, pad, 3), pad_value, np.uint8))
    save_png(np.concatenate(cols[:-1], axis=1).astype(np.float32) / 255.0,
             path)


def create_video(img_dir: str, out_path: str, fps: int = 20) -> bool:
    """Frames (img_dir/*.png) -> video at out_path; returns success.

    ffmpeg/libx264 when available (the reference's path,
    hugs/utils/general.py:86-92); falls back to cv2.VideoWriter (mp4v)
    so environments without an ffmpeg binary still produce the
    training/animation videos."""
    if shutil.which("ffmpeg") is not None:
        cmd = ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type",
               "glob", "-i", os.path.join(img_dir, "*.png"),
               "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=600)
            return True
        except Exception:
            pass
    try:
        import cv2
        frames = sorted(glob.glob(os.path.join(img_dir, "*.png")))
        if not frames:
            return False
        first = cv2.imread(frames[0])
        h, w = first.shape[:2]
        vw = cv2.VideoWriter(out_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            return False
        for f in frames:
            img = cv2.imread(f)
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
            vw.write(img)
        vw.release()
        return os.path.exists(out_path) and os.path.getsize(out_path) > 0
    except Exception:
        return False
