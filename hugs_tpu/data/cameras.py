"""Synthetic cameras + canonical SMPL pose helpers.

Equivalents of hugs/datasets/utils.py:15-201: static camera, orbiting
camera ring (for canonical/animation renders), predefined body poses
(da/a/t), and static/canonical SMPL parameter dicts. Returns frame dicts
shaped like the training data: {'camera': Camera, 'width', 'height', plus
SMPL params}, instead of raw matrix soup.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hugs_tpu.ops.graphics import projection_matrix, full_projection, \
    camera_center
from hugs_tpu.ops.rotations import axis_angle_to_matrix, matrix_to_axis_angle
from hugs_tpu.render.camera import Camera


def _camera_from_w2c(w2c_rowvec: jnp.ndarray, fovx: float, fovy: float,
                     znear=0.01, zfar=100.0) -> Camera:
    proj = projection_matrix(znear, zfar, fovx, fovy)
    return Camera(
        world_view=w2c_rowvec,
        full_proj=full_projection(w2c_rowvec, proj),
        center=camera_center(w2c_rowvec),
        tan_fovx=jnp.float32(np.tan(fovx / 2)),
        tan_fovy=jnp.float32(np.tan(fovy / 2)),
    )


def get_static_camera(img_size: int = 512, fov: float = 0.4):
    """Identity-extrinsics camera (reference datasets/utils.py:15-53)."""
    cam = _camera_from_w2c(jnp.eye(4), fov, fov)
    return {"camera": cam, "width": img_size, "height": img_size,
            "fovx": fov, "fovy": fov, "near": 0.01, "far": 100.0}


def _rot_y(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def get_rotating_camera(img_size=512, fov: float = 0.4, dist: float = 5.0,
                        nframes: int = 40,
                        angle_limit: float = 2 * np.pi) -> list[dict]:
    """Orbit around the origin: camera circles at `dist`, always looking
    at the center, with the y-down flip the reference applies
    (R[:, 1:3] *= -1).

    Deviation from reference datasets/utils.py:64-124 (by design): the
    reference composes rot(-azim) for the position with rot(azim) for
    the orientation, which makes the origin's camera depth d*cos(2
    azim) — the subject drifts out of the frustum and sits BEHIND the
    camera for half of every orbit. Here orientation and position use
    the SAME rotation, a true look-at: the origin projects to the image
    center at depth `dist` for every azimuth
    (tests/test_data.py::test_rotating_camera_look_at)."""
    if isinstance(img_size, int):
        img_size = (img_size, img_size)
    flip = np.diag([1.0, -1.0, -1.0]).astype(np.float32)  # y-down look-at
    out = []
    for azim in np.linspace(0.0, angle_limit, nframes):
        rot = _rot_y(azim)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = rot @ flip
        c2w[:3, 3] = rot @ np.array([0.0, 0.0, dist], np.float32)
        w2c = np.linalg.inv(c2w).T     # row-vector convention
        cam = _camera_from_w2c(jnp.asarray(w2c), fov, fov)
        out.append({"camera": cam, "width": img_size[1],
                    "height": img_size[0], "fovx": fov, "fovy": fov,
                    "near": 0.01, "far": 100.0})
    return out


def get_predefined_pose(pose_type: str) -> jnp.ndarray:
    """(69,) body pose (reference datasets/utils.py:127-141)."""
    pose = np.zeros(69, np.float32)
    if pose_type == "da_pose":
        pose[2], pose[5] = 1.0, -1.0
    elif pose_type == "a_pose":
        pose[2], pose[5] = 0.2, -0.2
        pose[47], pose[50] = -0.8, 0.8
    elif pose_type == "t_pose":
        pass
    else:
        raise ValueError(pose_type)
    return jnp.asarray(pose)


def get_smpl_static_params(betas, pose_type: str = "da_pose") -> dict:
    return {
        "betas": jnp.asarray(betas).reshape(10),
        "global_orient": jnp.zeros(3),
        "body_pose": get_predefined_pose(pose_type),
        "transl": jnp.zeros(3),
        "smpl_scale": jnp.float32(1.0),
    }


def get_smpl_canon_params(betas, nframes: int = 40,
                          pose_type: str = "da_pose") -> dict:
    """Turntable body poses (reference datasets/utils.py:169-201): rotate
    the body about y, composed with the 180deg x flip."""
    orients = []
    Rx = axis_angle_to_matrix(jnp.array([np.pi, 0.0, 0.0]))
    for idx in range(nframes):
        ang = 2 * np.pi * idx / nframes
        R = axis_angle_to_matrix(jnp.array([0.0, ang, 0.0])) @ Rx
        orients.append(matrix_to_axis_angle(R))
    body_pose = jnp.tile(get_predefined_pose(pose_type)[None], (nframes, 1))
    return {
        "betas": jnp.tile(jnp.asarray(betas).reshape(1, 10), (nframes, 1)),
        "global_orient": jnp.stack(orients),
        "body_pose": body_pose,
        "transl": jnp.tile(jnp.array([[0.0, 0.05, 5.0]]), (nframes, 1)),
        "smpl_scale": jnp.ones((nframes, 1)),
    }
