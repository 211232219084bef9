"""3D Gaussian covariance construction, pure JAX.

Matches the reference builders (hugs/utils/general.py:173-211): a Gaussian's
covariance is R S S^T R^T with R from a unit quaternion and S = diag(scales).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hugs_tpu.ops.rotations import quat_to_matrix, quat_normalize


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalized quaternion (N, 4) wxyz -> rotation matrices (N, 3, 3)."""
    return quat_to_matrix(quat_normalize(q))


def build_scaling_rotation(scales: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(scales): (N, 3, 3)."""
    R = build_rotation(q)
    return R * scales[..., None, :]


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Symmetric (N, 3, 3) -> packed upper-triangular 6 values
    (xx, xy, xz, yy, yz, zz), the 3DGS on-the-wire covariance layout."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def covariance_from_scaling_rotation(scales: jnp.ndarray, q: jnp.ndarray,
                                     scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Full 3x3 covariance matrices (N, 3, 3)."""
    L = build_scaling_rotation(scaling_modifier * scales, q)
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)
