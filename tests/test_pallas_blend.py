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
@pytest.mark.parametrize("power_mxu", [False, True])
def test_pallas_forward_matches_tiled(seed, power_mxu):
    means, scales, rotq, opacity, shs, cam = make_scene(seed=seed)
    bg = jnp.array([0.2, 0.3, 0.4])
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=8192)
    img_t = render(means, scales, rotq, opacity, shs, backend="tiled",
                   tile_cap=512, **kw)["render"]
    img_p = render(means, scales, rotq, opacity, shs, backend="pallas",
                   power_mxu=power_mxu, **kw)["render"]
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t),
                               atol=2e-5)


def test_pallas_gradients_match_tiled():
    means, scales, rotq, opacity, shs, cam = make_scene(n=200)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=8192)

    def loss(backend, m, s, q, o, c):
        # power_mxu=False: this test asserts the EXACT-path three-backend
        # invariant at the tight bar (the MXU mode has its own test below)
        img = render(m, s, q, o, c, backend=backend, tile_cap=512,
                     power_mxu=False, **kw)["render"]
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


def test_pallas_gradients_mxu_mode():
    """POWER_MXU parity contract: the recentered-basis matmul evaluates
    the exponent with ~1e-5 worst-case absolute error (pallas_blend.py
    POWER_MXU block comment), so its gradients match the tiled backend
    to ~power-error x gradient-scale — the same accuracy the exact path
    itself has against the dense oracle (both are ~3e-4 abs at grad
    scale ~20 on this scene)."""
    means, scales, rotq, opacity, shs, cam = make_scene(n=200)
    bg = jnp.array([0.5, 0.5, 0.5])
    target = jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=8192)

    def loss(backend, pmx, m, s, q, o, c):
        img = render(m, s, q, o, c, backend=backend, tile_cap=512,
                     power_mxu=pmx, **kw)["render"]
        return jnp.mean((img - target) ** 2)

    gt = jax.grad(lambda *a: loss("tiled", False, *a),
                  argnums=(0, 1, 2, 3, 4))(means, scales, rotq, opacity, shs)
    gp = jax.grad(lambda *a: loss("pallas", True, *a),
                  argnums=(0, 1, 2, 3, 4))(means, scales, rotq, opacity, shs)
    for name, a, b in zip(["means", "scales", "rotq", "opacity", "shs"],
                          gt, gp):
        scale = float(np.abs(np.asarray(a)).max())
        tol = 1e-4 + 1e-4 * scale
        err = float(np.abs(np.asarray(b) - np.asarray(a)).max())
        assert err <= tol, f"{name}: {err:.3e} > {tol:.3e}"


def test_pallas_bg_gradient():
    means, scales, rotq, opacity, shs, cam = make_scene(n=50)
    target = jnp.zeros((3, H, W))

    def loss(backend, bg):
        img = render(means, scales, rotq, opacity, shs, camera=cam,
                     width=W, height=H, bg=bg, backend=backend,
                     tile_cap=256, instance_budget=4096,
                     power_mxu=False)["render"]
        return jnp.mean((img - target) ** 2)

    g_t = jax.grad(lambda b: loss("tiled", b))(jnp.array([0.4, 0.5, 0.6]))
    g_p = jax.grad(lambda b: loss("pallas", b))(jnp.array([0.4, 0.5, 0.6]))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_t), atol=1e-5)


def make_saturating_scene():
    """Two depth layers of a dense, near-opaque splat grid covering the
    whole image (means built by inverse projection), so every in-bounds
    pixel of every tile saturates well before the chunk stream ends."""
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
    gx, gy = jnp.meshgrid(jnp.linspace(0.0, W - 1.0, 24),
                          jnp.linspace(0.0, H - 1.0, 16))
    px = jnp.tile(gx.ravel(), 2)                   # 2 layers x 384
    py = jnp.tile(gy.ravel(), 2)
    n = px.shape[0]
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    z = jnp.concatenate([
        4.0 + jax.random.uniform(ks[0], (n // 2,)) * 0.2,
        6.0 + jax.random.uniform(ks[1], (n // 2,)) * 0.2])
    # invert ndc_to_pixel + pinhole: x = z * tan_fov * ((2 px + 1)/W - 1)
    mx = z * cam.tan_fovx * ((2.0 * px + 1.0) / W - 1.0)
    my = z * cam.tan_fovy * ((2.0 * py + 1.0) / H - 1.0)
    means = jnp.stack([mx, my, z], axis=-1)
    scales = jnp.full((n, 3), 0.4)
    rotq = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opacity = jnp.full((n,), 0.97)
    shs = jax.random.normal(ks[2], (n, 16, 3)) * 0.3
    return means, scales, rotq, opacity, shs, cam


def test_pallas_saturated_early_termination():
    """The [T_i >= T_EPS] indicator + forward early-out must fire on a
    saturated scene and still agree with the oracle, incl. gradients
    (covers the stream-skip + short-backward path)."""
    means, scales, rotq, opacity, shs, cam = make_saturating_scene()
    bg = jnp.array([0.9, 0.1, 0.2])
    target = jax.random.uniform(jax.random.PRNGKey(5), (3, H, W))

    def loss(backend, m, o):
        # exact path for the tight oracle comparison; the early-out check
        # below runs _blend_pallas_core in BOTH power modes
        img = render(m, scales, rotq, o, shs, camera=cam, width=W,
                     height=H, bg=bg, active_sh_degree=2, backend=backend,
                     tile_cap=1024, instance_budget=16384,
                     power_mxu=False)["render"]
        return jnp.mean((img - target) ** 2), img

    (lo, io), go = jax.value_and_grad(
        lambda m, o: loss("oracle", m, o), argnums=(0, 1),
        has_aux=True)(means, opacity)
    (lp, ip), gp = jax.value_and_grad(
        lambda m, o: loss("pallas", m, o), argnums=(0, 1),
        has_aux=True)(means, opacity)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(io), atol=2e-5)
    for name, a, b in zip(["means", "opacity"], go, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-3, err_msg=name)

    # the forward must actually have cut the chunk walk short
    from hugs_tpu.render.project import project_gaussians
    from hugs_tpu.render.tiles import bin_gaussians
    from hugs_tpu.render.pallas_blend import (
        _gauss_feat, _pack_aligned, _blend_pallas_core, CHUNK)
    pg = project_gaussians(means, scales, rotq, opacity, shs, cam, W, H, 2)
    bins = bin_gaussians(pg, W, H, 16384, 32)
    I = bins.gauss_id.shape[0]
    inst = _pack_aligned(_gauss_feat(pg), bins.gauss_id,
                         (-(-I // CHUNK)) * CHUNK)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    total_chunks = int(jnp.sum((counts + CHUNK - 1) // CHUNK))
    for pm in (False, True):   # saturation-skip must fire in BOTH modes
        _, nchunks = _blend_pallas_core(
            inst, bins.starts, counts,
            bins.aligned_total.astype(jnp.int32),
            bg, 2, 2, 32, W, H, power_mxu=pm)
        assert int(jnp.sum(nchunks)) < total_chunks, \
            f"early termination never fired (power_mxu={pm})"


def test_pallas_many_chunks_and_empty_tiles():
    """>2 chunks per tile plus completely empty tiles in the same cell:
    the multi-chunk reverse walk and the empty-subtile prefill paths."""
    n = 700
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    # concentrated in the upper-left corner -> other tiles stay empty
    means = jax.random.normal(ks[0], (n, 3)) * 0.05
    means = means.at[:, 0].add(-0.55).at[:, 1].add(-0.45)
    means = means.at[:, 2].set(jnp.abs(means[:, 2]) + 4.0)
    scales = jnp.full((n, 3), 0.02)
    rotq = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opacity = jnp.full((n,), 0.05)        # translucent: no early-out
    shs = jax.random.normal(ks[1], (n, 16, 3)) * 0.3
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
    bg = jnp.array([0.1, 0.2, 0.3])
    target = jax.random.uniform(ks[2], (3, H, W))

    def loss(backend, m, o, c):
        img = render(m, scales, rotq, o, c, camera=cam, width=W, height=H,
                     bg=bg, active_sh_degree=1, backend=backend,
                     tile_cap=1024, instance_budget=16384,
                     power_mxu=False)["render"]
        return jnp.mean((img - target) ** 2)

    gt = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2))(
        means, opacity, shs)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(
        means, opacity, shs)
    for name, a, b in zip(["means", "opacity", "shs"], gt, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("power_mxu", [False, True])
def test_pallas_tile16(power_mxu):
    """tile=16 path (P=256): non-default tile size end to end (in MXU
    mode this also covers the K=24 -> 32 padded basis rows)."""
    means, scales, rotq, opacity, shs, cam = make_scene(n=150, seed=5)
    bg = jnp.array([0.3, 0.3, 0.3])
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=16384, tile=16)
    img_t = render(means, scales, rotq, opacity, shs, backend="tiled",
                   tile_cap=512, **kw)["render"]
    img_p = render(means, scales, rotq, opacity, shs, backend="pallas",
                   power_mxu=power_mxu, **kw)["render"]
    # 2e-5: the pallas color accumulate runs bf16-split matmuls
    # (~4e-6 relative per product, pallas_blend._split_mm3), so its
    # noise floor vs the f32 tiled backend sits just above 1e-5.
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t),
                               atol=2e-5)
