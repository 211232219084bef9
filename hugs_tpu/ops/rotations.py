"""Rotation representation conversions, pure JAX.

Covers the conversions the HUGS pipeline needs (reference:
hugs/utils/rotations.py): quaternion (w, x, y, z convention), rotation
matrix, axis-angle, and the continuous 6D representation of
Zhou et al. 2019. All functions are batched over leading axes and
differentiable; formulas are the standard closed forms, written for
XLA (no data-dependent branching).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternions to unit norm. q: (..., 4) in (w, x, y, z)."""
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 2.0 / jnp.clip(jnp.sum(q * q, axis=-1), _EPS)
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free variant: computes all four Shepperd candidates and picks
    the numerically best by largest denominator (jnp.where select), so it
    is safe under jit/vmap and differentiable a.e.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate squared magnitudes (>= 0): w^2, x^2, y^2, z^2 scaled by 4
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate quaternions, each stable when its pivot is the largest.
    def _safe_div(a, b):
        return a / jnp.clip(b, _EPS)

    sw = jnp.sqrt(jnp.clip(qw2, _EPS)) * 2.0
    cand_w = jnp.stack(
        [0.25 * sw,
         _safe_div(m21 - m12, sw),
         _safe_div(m02 - m20, sw),
         _safe_div(m10 - m01, sw)], axis=-1)
    sx = jnp.sqrt(jnp.clip(qx2, _EPS)) * 2.0
    cand_x = jnp.stack(
        [_safe_div(m21 - m12, sx), 0.25 * sx,
         _safe_div(m01 + m10, sx), _safe_div(m02 + m20, sx)], axis=-1)
    sy = jnp.sqrt(jnp.clip(qy2, _EPS)) * 2.0
    cand_y = jnp.stack(
        [_safe_div(m02 - m20, sy), _safe_div(m01 + m10, sy),
         0.25 * sy, _safe_div(m12 + m21, sy)], axis=-1)
    sz = jnp.sqrt(jnp.clip(qz2, _EPS)) * 2.0
    cand_z = jnp.stack(
        [_safe_div(m10 - m01, sz), _safe_div(m02 + m20, sz),
         _safe_div(m12 + m21, sz), 0.25 * sz], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    # Canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions (..., 4) wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def _safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """||x|| along the last axis with a gradient defined (zero) at x=0."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) (direction * angle) -> quaternion (..., 4) wxyz."""
    angle = _safe_norm(aa)
    half = 0.5 * angle
    # sinc-style stable small-angle: sin(half)/angle
    k = jnp.where(angle > 1e-6, jnp.sin(half) / jnp.clip(angle, _EPS),
                  0.5 - angle * angle / 48.0)
    return jnp.concatenate([jnp.cos(half), aa * k], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz -> axis-angle (..., 3)."""
    q = quat_normalize(q)
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = _safe_norm(v)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    k = jnp.where(vnorm > 1e-6, angle / jnp.clip(vnorm, _EPS),
                  2.0 / jnp.clip(w, _EPS))
    return v * k


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    return quat_to_matrix(axis_angle_to_quat(aa))


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quat_to_axis_angle(matrix_to_quat(m))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D rep (..., 6) -> rotation matrix (..., 3, 3).

    Gram-Schmidt on the two 3-vectors (Zhou et al. 2019), matching the
    semantics of the reference's rotation_6d_to_matrix
    (hugs/utils/rotations.py:552-574).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.clip(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6D rep (first two rows, flattened)."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def axis_angle_to_rotation_6d(aa: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(aa))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def rotation_matrix_from_vectors(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) rotating unit direction a onto b.

    Used for aligning Gaussian +z axes with mesh vertex normals at init
    (reference: hugs/utils/rotations.py:613-634).
    """
    a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)  # cos
    # Skew-symmetric cross-product matrix K; R = I + K + K^2/(1+c)
    zeros = jnp.zeros_like(c)
    K = jnp.stack(
        [
            zeros, -v[..., 2], v[..., 1],
            v[..., 2], zeros, -v[..., 0],
            -v[..., 1], v[..., 0], zeros,
        ],
        axis=-1,
    ).reshape(a.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    denom = jnp.clip(1.0 + c, _EPS)[..., None, None]
    R = eye + K + jnp.matmul(K, K,
                             precision=jax.lax.Precision.HIGHEST) / denom
    # antiparallel (c ~ -1): rotate 180 deg about any axis orthogonal to a
    ortho = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9,
                                   jnp.array([1.0, 0.0, 0.0]),
                                   jnp.array([0.0, 1.0, 0.0])))
    ortho = ortho / jnp.clip(jnp.linalg.norm(ortho, axis=-1, keepdims=True), _EPS)
    R180 = quat_to_matrix(jnp.concatenate([jnp.zeros_like(c)[..., None], ortho], axis=-1))
    return jnp.where((c < -1.0 + 1e-6)[..., None, None], R180, R)


# ----------------------------------------------------------- euler angles

def euler_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles (..., 3) -> rotation matrices, extrinsic fixed-axis
    composition (reference euler_angles_to_matrix semantics,
    hugs/utils/rotations.py:189-227)."""
    def axis_rot(axis, a):
        c, s = jnp.cos(a), jnp.sin(a)
        one, zero = jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            rows = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            rows = [c, zero, s, zero, one, zero, -s, zero, c]
        else:
            rows = [c, -s, zero, s, c, zero, zero, zero, one]
        return jnp.stack(rows, axis=-1).reshape(a.shape + (3, 3))

    mats = [axis_rot(ax, euler[..., i]) for i, ax in enumerate(convention)]
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return mm(mm(mats[0], mats[1]), mats[2])


def matrix_to_euler(m: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Rotation matrices -> euler angles for the XYZ convention."""
    assert convention == "XYZ"
    sy = jnp.clip(-m[..., 2, 0], -1.0, 1.0)
    y = jnp.arcsin(sy)
    x = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    z = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)
