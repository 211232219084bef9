import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from hugs_tpu.ops import (
    eval_sh, rgb_to_sh, sh_to_rgb, knn, mean_sq_dist_to_knn, grid_sample_2d,
    covariance_from_scaling_rotation, strip_symmetric, build_rotation,
    projection_matrix, world_to_view, full_projection,
)
from hugs_tpu.ops.sh import eval_sh_masked
from hugs_tpu.ops.graphics import transform_points, camera_center


def test_sh_deg0_constant():
    sh = jnp.zeros((5, 3, 16)).at[:, :, 0].set(1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(3, sh, dirs)
    np.testing.assert_allclose(out, 0.28209479, atol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (10, 3))
    np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_sh_dc_matches_rgb():
    # With only the DC coefficient set, eval + 0.5 must reproduce the RGB.
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (10, 3))
    sh = jnp.zeros((10, 3, 16)).at[:, :, 0].set(rgb_to_sh(rgb))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (10, 1))
    np.testing.assert_allclose(eval_sh(3, sh, dirs) + 0.5, rgb, atol=1e-5)


def test_sh_masked_matches_truncated():
    key = jax.random.PRNGKey(3)
    sh = jax.random.normal(key, (7, 3, 16))
    dirs = jax.random.normal(jax.random.PRNGKey(4), (7, 3))
    dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(4):
        got = eval_sh_masked(3, jnp.int32(deg), sh, dirs)
        want = eval_sh(deg, sh[..., :(deg + 1) ** 2], dirs)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_knn_vs_numpy():
    pts = np.random.RandomState(0).randn(200, 3).astype(np.float32)
    q = np.random.RandomState(1).randn(50, 3).astype(np.float32)
    d, idx = knn(jnp.array(q), jnp.array(pts), k=4, chunk=32)
    full = ((q[:, None] - pts[None]) ** 2).sum(-1)
    idx_np = np.argsort(full, axis=1)[:, :4]
    np.testing.assert_array_equal(np.sort(idx, 1), np.sort(idx_np, 1))
    np.testing.assert_allclose(np.sort(d, 1), np.sort(np.take_along_axis(full, idx_np, 1), 1), rtol=1e-4, atol=1e-5)


def test_knn_group_min_edge_cases():
    """The fused group-min extraction (ops/knn.py): repeated extraction
    from the same 128-lane group (clustered refs), off-origin clouds,
    non-multiple-of-128 ref counts, k at the fallback boundary."""
    rng = np.random.RandomState(7)
    for M, N, k, spread, off in [(333, 1000, 6, 1.0, 0.0),
                                 (128, 300, 8, 1e-3, 5.0),
                                 (40, 128, 6, 1.0, 100.0),
                                 (64, 129, 3, 1.0, 0.0),
                                 (20, 500, 9, 1.0, 0.0)]:  # k>8 fallback
        pts = (rng.randn(N, 3) * spread + off).astype(np.float32)
        q = (rng.randn(M, 3) * spread + off).astype(np.float32)
        d, idx = knn(jnp.array(q), jnp.array(pts), k=k, chunk=64)
        full = ((q[:, None].astype(np.float64) - pts[None]) ** 2).sum(-1)
        want = np.sort(full, axis=1)[:, :k]
        np.testing.assert_allclose(np.sort(np.asarray(d), 1), want,
                                   rtol=2e-3, atol=1e-9)
        # chosen indices achieve the optimal distances (ties may permute)
        got = np.take_along_axis(full, np.asarray(idx), 1)
        np.testing.assert_allclose(np.sort(got, 1), want,
                                   rtol=2e-3, atol=1e-9)
        # ascending, no duplicates
        assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-12)
        for r in range(M):
            assert len(set(np.asarray(idx)[r].tolist())) == k


def test_mean_sq_dist_excludes_self():
    pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0], [4.0, 0, 0]])
    d = mean_sq_dist_to_knn(pts, k=2)
    # point 0: nearest others at 1 and 2 -> mean(1, 4) = 2.5
    np.testing.assert_allclose(d[0], 2.5, atol=1e-5)


def test_grid_sample_matches_torch():
    H, W, C = 7, 9, 4
    rng = np.random.RandomState(0)
    plane = rng.randn(H, W, C).astype(np.float32)
    coords = rng.uniform(-1, 1, (25, 2)).astype(np.float32)

    ours = grid_sample_2d(jnp.array(plane), jnp.array(coords))

    t_plane = torch.tensor(plane).permute(2, 0, 1)[None]  # (1,C,H,W)
    t_grid = torch.tensor(coords)[None, :, None, :]       # (1,N,1,2)
    ref = F.grid_sample(t_plane, t_grid, align_corners=True,
                        mode='bilinear')[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_covariance_psd_and_pack():
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (32, 4))
    s = jnp.exp(jax.random.normal(jax.random.PRNGKey(6), (32, 3)) * 0.3)
    cov = covariance_from_scaling_rotation(s, q)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert (evals > 0).all()
    # eigenvalues are the squared scales
    np.testing.assert_allclose(np.sort(evals, 1), np.sort(np.asarray(s) ** 2, 1), rtol=1e-4)
    packed = strip_symmetric(cov)
    assert packed.shape == (32, 6)
    np.testing.assert_allclose(packed[:, 0], cov[:, 0, 0])


def test_projection_roundtrip():
    import math
    fovx, fovy = 0.8, 0.6
    P = projection_matrix(0.1, 100.0, fovx, fovy)
    # a point on the frustum edge at depth z maps to x_ndc = 1
    z = 5.0
    x_edge = math.tan(fovx / 2) * z
    pt = jnp.array([[x_edge, 0.0, z]])
    ndc = transform_points(pt, P)
    np.testing.assert_allclose(ndc[0, 0], 1.0, atol=1e-4)
    # center point maps to 0
    ndc_c = transform_points(jnp.array([[0.0, 0.0, z]]), P)
    np.testing.assert_allclose(ndc_c[0, :2], 0.0, atol=1e-6)


def test_world_to_view_camera_center():
    # camera at origin looking down +z: R=I, t=0
    R = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 4.0])
    wv = world_to_view(R, t)
    # world point at origin -> camera coords (0,0,4)
    cam = transform_points(jnp.array([[0.0, 0.0, 0.0]]), wv)
    np.testing.assert_allclose(cam[0], [0, 0, 4], atol=1e-5)
    cc = camera_center(wv)
    np.testing.assert_allclose(cc, [0, 0, -4], atol=1e-5)
