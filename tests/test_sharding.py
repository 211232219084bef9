"""Sharded-vs-single-device equivalence on the 8-device CPU mesh
(SURVEY.md §4.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugs_tpu.parallel import make_mesh, render_tile_sharded, \
    batch_render_sharded
from hugs_tpu.render import render, make_camera

pytestmark = pytest.mark.slow  # 8-device shard_map compiles dominate suite time

W, H = 48, 32


def make_scene(n=120, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1)
    means = means.at[:, 2].set(means[:, 2] * 2 + 4.0)
    scales = jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.3 - 2.5)
    rotq = jax.random.normal(ks[2], (n, 4))
    rotq /= jnp.linalg.norm(rotq, axis=-1, keepdims=True)
    opacity = jax.nn.sigmoid(jax.random.normal(ks[3], (n,)))
    shs = jax.random.normal(ks[4], (n, 16, 3)) * 0.3
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
    return means, scales, rotq, opacity, shs, cam


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_tile_sharded_matches_single_device():
    means, scales, rotq, opacity, shs, cam = make_scene()
    bg = jnp.array([0.1, 0.2, 0.3])
    mesh = make_mesh()
    img_sh = render_tile_sharded(means, scales, rotq, opacity, shs, cam,
                                 W, H, mesh, bg=bg, active_sh_degree=3,
                                 tile_cap=128)
    img_1 = render(means, scales, rotq, opacity, shs, cam, W, H, bg=bg,
                   active_sh_degree=3, backend="tiled",
                   tile_cap=128)["render"]
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_1),
                               atol=2e-5)


def test_tile_sharded_gradients_match():
    means, scales, rotq, opacity, shs, cam = make_scene(n=60)
    bg = jnp.zeros(3)
    mesh = make_mesh()
    target = jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))

    def loss_sh(m, o):
        img = render_tile_sharded(m, scales, rotq, o, shs, cam, W, H, mesh,
                                  bg=bg, tile_cap=128)
        return jnp.mean((img - target) ** 2)

    def loss_1(m, o):
        img = render(m, scales, rotq, o, shs, cam, W, H, bg=bg,
                     backend="tiled", tile_cap=128)["render"]
        return jnp.mean((img - target) ** 2)

    g_sh = jax.grad(loss_sh, argnums=(0, 1))(means, opacity)
    g_1 = jax.grad(loss_1, argnums=(0, 1))(means, opacity)
    for a, b in zip(g_sh, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-3)


def test_batch_render_sharded():
    means, scales, rotq, opacity, shs, _ = make_scene(n=60)
    mesh = make_mesh(axis_names=("data",))
    # 8 cameras (one per device): vary the x-offset
    ts = jnp.stack([jnp.array([0.1 * i - 0.35, 0.0, 0.0])
                    for i in range(8)])
    cams = jax.vmap(lambda t: make_camera(jnp.eye(3), t, 0.9, 0.7))(ts)

    def render_one(cam):
        return render(means, scales, rotq, opacity, shs, cam, W, H,
                      backend="tiled", tile_cap=128)["render"]

    imgs = batch_render_sharded(render_one, cams, mesh)
    assert imgs.shape == (8, 3, H, W)
    ref0 = render_one(jax.tree.map(lambda x: x[3], cams))
    np.testing.assert_allclose(np.asarray(imgs[3]), np.asarray(ref0),
                               atol=2e-5)
    # different cameras produce different images
    assert float(jnp.abs(imgs[0] - imgs[7]).mean()) > 1e-4
