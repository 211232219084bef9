"""Camera/projection math, pure JAX.

Conventions follow the 3DGS/HUGS stack (reference: hugs/utils/graphics.py):
row-vector convention — points are multiplied as p_hom @ M, so the matrices
built here are the TRANSPOSE of the usual column-vector OpenGL forms.
`world_to_view(R, t)` corresponds to getWorld2View (graphics.py:39-44) and
`projection_matrix` to get_projection_matrix (graphics.py:76-96), both
returned already transposed for row-vector use, matching the tensors the
reference datasets precompute (`world_view_transform`,
`full_proj_transform`, hugs/datasets/neuman.py:310-392).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """World->camera 4x4, ROW-VECTOR convention (already transposed).

    R: (3, 3) camera rotation (world axes in camera frame is R^T as in
    COLMAP convention used by 3DGS); t: (3,) translation.
    Column-vector form is [[R^T, t], [0, 1]]; we return its transpose.
    """
    Rt = jnp.zeros((4, 4), dtype=jnp.float32)
    Rt = Rt.at[:3, :3].set(R.T)
    Rt = Rt.at[:3, 3].set(t)
    Rt = Rt.at[3, 3].set(1.0)
    return Rt.T


def projection_matrix(znear: float, zfar: float, fovx: float,
                      fovy: float) -> jnp.ndarray:
    """Perspective projection 4x4, ROW-VECTOR convention (transposed).

    Z maps to [0, 1] NDC with z_sign=+1 (3DGS convention).
    """
    tan_x = math.tan(fovx / 2.0)
    tan_y = math.tan(fovy / 2.0)
    P = jnp.zeros((4, 4), dtype=jnp.float32)
    P = P.at[0, 0].set(1.0 / tan_x)
    P = P.at[1, 1].set(1.0 / tan_y)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    P = P.at[3, 2].set(1.0)
    return P.T


def projection_matrix_center(znear: float, zfar: float, fx: float, fy: float,
                             cx: float, cy: float, width: float,
                             height: float) -> jnp.ndarray:
    """Principal-point-aware projection (reference graphics.py:61-73),
    row-vector convention (transposed)."""
    cx_flip = width - cx
    P = jnp.zeros((4, 4), dtype=jnp.float32)
    P = P.at[0, 0].set(2.0 * fx / width)
    P = P.at[1, 1].set(2.0 * fy / height)
    P = P.at[0, 2].set(1.0 - 2.0 * cx_flip / width)
    P = P.at[1, 2].set(2.0 * cy / height - 1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    P = P.at[3, 2].set(1.0)
    return P.T


def full_projection(world_view: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """Composed world->NDC transform in row-vector convention:
    p @ full = (p @ world_view) @ proj."""
    return world_view @ proj


def camera_center(world_view: jnp.ndarray) -> jnp.ndarray:
    """Camera position in world coords from a row-vector world_view."""
    return jnp.linalg.inv(world_view)[3, :3]


def transform_points(points: jnp.ndarray, mat4: jnp.ndarray) -> jnp.ndarray:
    """Apply a row-vector 4x4 to (N, 3) points, perspective divide."""
    ones = jnp.ones_like(points[..., :1])
    hom = jnp.matmul(jnp.concatenate([points, ones], axis=-1), mat4,
                     precision=jax.lax.Precision.HIGHEST)
    return hom[..., :3] / (hom[..., 3:4] + 1e-7)
