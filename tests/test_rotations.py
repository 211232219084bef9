import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugs_tpu.ops import (
    quat_to_matrix, matrix_to_quat, axis_angle_to_matrix, matrix_to_axis_angle,
    axis_angle_to_quat, quat_to_axis_angle, rotation_6d_to_matrix,
    matrix_to_rotation_6d, quat_multiply, quat_normalize,
)
from hugs_tpu.ops.rotations import rotation_matrix_from_vectors


def random_quats(n, seed=0):
    q = jax.random.normal(jax.random.PRNGKey(seed), (n, 4))
    return quat_normalize(q)


def test_quat_matrix_roundtrip():
    q = random_quats(128)
    q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
    m = quat_to_matrix(q)
    # Valid rotations: orthonormal, det +1
    eye = jnp.einsum('nij,nkj->nik', m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (128, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)
    q2 = matrix_to_quat(m)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_identity():
    q = jnp.array([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(quat_to_matrix(q)[0], np.eye(3), atol=1e-7)


def test_quat_known_90deg_z():
    # 90deg about z: x axis -> y axis
    q = jnp.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    m = quat_to_matrix(q)[0]
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_axis_angle_roundtrip():
    # keep angles strictly below pi — the axis-angle chart is only
    # injective there, so only there is the roundtrip exact
    aa = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    aa = aa / jnp.linalg.norm(aa, axis=-1, keepdims=True)
    aa = aa * jax.random.uniform(jax.random.PRNGKey(2), (64, 1), minval=0.01,
                                 maxval=3.0)
    m = axis_angle_to_matrix(aa)
    aa2 = matrix_to_axis_angle(m)
    np.testing.assert_allclose(aa2, aa, atol=1e-4)


def test_axis_angle_small_angle_stable():
    aa = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
    q = axis_angle_to_quat(aa)
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(q[1], [1, 0, 0, 0], atol=1e-7)
    g = jax.jacobian(lambda a: axis_angle_to_matrix(a).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotation_6d_roundtrip():
    q = random_quats(64, seed=2)
    m = quat_to_matrix(q)
    d6 = matrix_to_rotation_6d(m)
    m2 = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_quat_multiply_composition():
    qa, qb = random_quats(32, 3), random_quats(32, 4)
    m_ab = quat_to_matrix(quat_multiply(qa, qb))
    m_ref = quat_to_matrix(qa) @ quat_to_matrix(qb)
    np.testing.assert_allclose(m_ab, m_ref, atol=1e-5)


def test_rotation_matrix_from_vectors():
    key = jax.random.PRNGKey(5)
    a = jax.random.normal(key, (64, 3))
    b = jax.random.normal(jax.random.PRNGKey(6), (64, 3))
    a /= jnp.linalg.norm(a, axis=-1, keepdims=True)
    b /= jnp.linalg.norm(b, axis=-1, keepdims=True)
    R = rotation_matrix_from_vectors(a, b)
    np.testing.assert_allclose(jnp.einsum('nij,nj->ni', R, a), b, atol=1e-5)
    # antiparallel special case
    R2 = rotation_matrix_from_vectors(a, -a)
    np.testing.assert_allclose(jnp.einsum('nij,nj->ni', R2, a), -a, atol=1e-4)


@pytest.mark.parametrize("fn", [quat_to_matrix, axis_angle_to_matrix,
                                rotation_6d_to_matrix])
def test_grads_finite(fn):
    dim = {quat_to_matrix: 4, axis_angle_to_matrix: 3,
           rotation_6d_to_matrix: 6}[fn]
    x = jax.random.normal(jax.random.PRNGKey(7), (8, dim))
    g = jax.grad(lambda v: jnp.sum(fn(v) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))
