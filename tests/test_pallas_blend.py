"""Pallas blend kernel vs the XLA tiled backend (interpret mode on CPU;
the same kernels compile with Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugs_tpu.render import render, make_camera

W, H = 64, 48


def make_scene(n=300, seed=0):
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


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_forward_matches_tiled(seed):
    means, scales, rotq, opacity, shs, cam = make_scene(seed=seed)
    bg = jnp.array([0.2, 0.3, 0.4])
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=8192)
    img_t = render(means, scales, rotq, opacity, shs, backend="tiled",
                   tile_cap=512, **kw)["render"]
    img_p = render(means, scales, rotq, opacity, shs, backend="pallas",
                   **kw)["render"]
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t),
                               atol=1e-5)


def test_pallas_gradients_match_tiled():
    means, scales, rotq, opacity, shs, cam = make_scene(n=200)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=8192)

    def loss(backend, m, s, q, o, c):
        img = render(m, s, q, o, c, backend=backend, tile_cap=512,
                     **kw)["render"]
        return jnp.mean((img - target) ** 2)

    gt = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3, 4))(
        means, scales, rotq, opacity, shs)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(
        means, scales, rotq, opacity, shs)
    for name, a, b in zip(["means", "scales", "rotq", "opacity", "shs"],
                          gt, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-6, rtol=1e-4,
            err_msg=name)


def test_pallas_bg_gradient():
    means, scales, rotq, opacity, shs, cam = make_scene(n=50)
    target = jnp.zeros((3, H, W))

    def loss(backend, bg):
        img = render(means, scales, rotq, opacity, shs, camera=cam,
                     width=W, height=H, bg=bg, backend=backend,
                     tile_cap=256, instance_budget=4096)["render"]
        return jnp.mean((img - target) ** 2)

    g_t = jax.grad(lambda b: loss("tiled", b))(jnp.array([0.4, 0.5, 0.6]))
    g_p = jax.grad(lambda b: loss("pallas", b))(jnp.array([0.4, 0.5, 0.6]))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_t), atol=1e-5)
