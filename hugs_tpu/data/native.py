"""ctypes bindings for the native IO runtime (native/hugs_io.cpp).

Auto-builds libhugs_io.so with the repo Makefile on first use; every
entry point has a pure-Python fallback so the framework works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhugs_io.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hugs_parse_points3d.restype = ctypes.c_int64
        lib.hugs_parse_points3d.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.hugs_parse_images.restype = ctypes.c_int64
        lib.hugs_parse_images.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def parse_points3d(path: str):
    """Fast points3D.txt parse -> (xyz (N,3) f32, rgb (N,3) f32 in [0,1])
    or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.hugs_parse_points3d(path.encode(), None, None, 0)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    got = lib.hugs_parse_points3d(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        return None
    return xyz, rgb


def parse_images(path: str):
    """Fast images.txt parse -> (quat (N,4) f64 wxyz, trans (N,3) f64,
    cam_ids (N,) i32, names list[str]) or None."""
    lib = _load()
    if lib is None:
        return None
    n = lib.hugs_parse_images(path.encode(), None, None, None, None, 0, 0)
    if n < 0:
        return None
    quat = np.empty((n, 4), np.float64)
    trans = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names_cap = 65536 + 256 * n
    names_buf = ctypes.create_string_buffer(names_cap)
    got = lib.hugs_parse_images(
        path.encode(), quat.ctypes.data_as(ctypes.c_void_p),
        trans.ctypes.data_as(ctypes.c_void_p),
        cam_ids.ctypes.data_as(ctypes.c_void_p),
        names_buf, names_cap, n)
    if got != n:
        return None
    names = names_buf.value.decode().split("\n")[:n]
    return quat, trans, cam_ids, names
