"""Camera pytree.

Field meanings mirror the per-frame dicts the reference datasets produce
(hugs/datasets/neuman.py:310-392): row-vector `world_view` /`full_proj`
transforms, camera center, and half-angle tangents. Image height/width are
carried as static metadata on the render calls (shapes must be static
under jit), not inside the pytree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hugs_tpu.ops.graphics import (
    projection_matrix, world_to_view, full_projection, camera_center,
)


class Camera(NamedTuple):
    world_view: jnp.ndarray   # (4, 4) row-vector world->camera
    full_proj: jnp.ndarray    # (4, 4) row-vector world->NDC
    center: jnp.ndarray       # (3,) camera position in world
    tan_fovx: jnp.ndarray     # scalar
    tan_fovy: jnp.ndarray     # scalar


def make_camera(R: jnp.ndarray, t: jnp.ndarray, fovx: float, fovy: float,
                znear: float = 0.01, zfar: float = 100.0) -> Camera:
    """Build a Camera from COLMAP-style extrinsics (R, t) and fovs."""
    wv = world_to_view(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    proj = projection_matrix(znear, zfar, fovx, fovy)
    return Camera(
        world_view=wv,
        full_proj=full_projection(wv, proj),
        center=camera_center(wv),
        tan_fovx=jnp.float32(jnp.tan(fovx / 2.0)),
        tan_fovy=jnp.float32(jnp.tan(fovy / 2.0)),
    )
