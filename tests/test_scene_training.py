"""End-to-end scene-only 3DGS training on a synthetic scene (SURVEY.md §7
step 4: the minimum end-to-end slice, scaled down for CPU CI)."""
import jax
import jax.numpy as jnp
import numpy as np

from hugs_tpu.cfg import default_config
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.render import render, make_camera
from hugs_tpu.losses.basic import psnr
from hugs_tpu.train.scene_step import (
    SceneTrainState, init_scene_train_state, scene_train_step,
    scene_densify_step, make_scene_lrs,
)

W, H = 64, 48


def gt_scene(n=120, seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.2, maxval=1.2)
    means = means.at[:, 2].set(means[:, 2] + 4.0)
    scales = jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.2 - 2.0)
    rotq = jax.random.normal(ks[2], (n, 4))
    rotq /= jnp.linalg.norm(rotq, axis=-1, keepdims=True)
    opacity = jax.nn.sigmoid(jax.random.normal(ks[3], (n,)) + 1.0)
    shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
        jax.random.uniform(ks[4], (n, 3), minval=-1.0, maxval=1.0))
    return means, scales, rotq, opacity, shs


def cameras():
    cams = []
    for ang in [0.0, 0.3, -0.3]:
        c, s = np.cos(ang), np.sin(ang)
        R = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32)
        # orbit the camera around the cloud center (z=4): camera-space
        # transform is x_cam = R^T (x - pos); make_camera takes (R, t)
        # with x_cam = R^T x + t, so t = -R^T pos.
        center = np.array([0, 0, 4.0])
        pos = center - np.asarray(R).T @ np.array([0, 0, 4.0])
        t = jnp.asarray(-np.asarray(R).T @ pos, jnp.float32)
        cams.append(make_camera(R, t, 0.9, 0.7))
    return cams


def test_scene_fit_improves_psnr():
    means, scales, rotq, opacity, shs = gt_scene()
    cams = cameras()
    bg = jnp.zeros(3)
    targets = [
        render(means, scales, rotq, opacity, shs, cam, W, H, bg=bg,
               active_sh_degree=0, backend="tiled", tile_cap=256)["render"]
        for cam in cams
    ]
    # verify the GT scene is actually visible from every camera
    for tgt in targets:
        assert float(jnp.mean(tgt)) > 0.01

    # init from perturbed GT positions (a noisy point cloud), grey colors
    key = jax.random.PRNGKey(0)
    noisy_pts = means + 0.05 * jax.random.normal(key, means.shape)
    colors = 0.5 * jnp.ones((means.shape[0], 3))
    capacity = 512
    gs = sgs.create_from_pcd(np.asarray(noisy_pts), np.asarray(colors),
                             capacity, max_sh_degree=3)
    state = init_scene_train_state(gs)

    cfg = default_config().scene.lr
    static_lrs, xyz_sched = make_scene_lrs(cfg, spatial_lr_scale=2.0)
    # boost LRs for the tiny 200-step CPU test (reference runs 30k steps)
    static_lrs = {k: v * 10 for k, v in static_lrs.items()}

    psnr0 = None
    step_kw = dict(width=W, height=H, backend="tiled", tile_cap=256,
                   instance_budget=4096)
    for step in range(200):
        cam_i = step % len(cams)
        state, aux = scene_train_step(
            state, cams[cam_i], targets[cam_i], bg,
            jnp.float32(xyz_sched(step) * 10), static_lrs, **step_kw)
        if step == 0:
            psnr0 = -10 * np.log10(float(aux["psnr_mse"]))
            assert not bool(aux["overflowed"])
        if step == 120:
            state, info = scene_densify_step(
                state, jax.random.PRNGKey(step), 4.0,
                grad_threshold=0.0002, min_opacity=0.005)
            assert int(info["n_alive"]) <= capacity

    psnr1 = -10 * np.log10(float(aux["psnr_mse"]))
    assert np.isfinite(psnr1)
    assert psnr1 > psnr0 + 3.0, f"PSNR {psnr0:.2f} -> {psnr1:.2f}"


def test_densify_prune_invariants():
    means, scales, rotq, opacity, shs = gt_scene(n=60)
    capacity = 128
    gs = sgs.create_from_pcd(np.asarray(means), 0.5 * np.ones((60, 3)),
                             capacity)
    state = init_scene_train_state(gs)
    # fake stats: half the points have hot gradients
    hot = jnp.arange(capacity) < 30
    gs = state.gs._replace(
        xyz_gradient_accum=jnp.where(hot, 1.0, 0.0),
        denom=jnp.ones(capacity))
    state = state._replace(gs=gs)

    n0 = int(gs.n_alive)
    state2, info = scene_densify_step(
        state, jax.random.PRNGKey(0), 4.0, grad_threshold=0.5,
        min_opacity=0.001)
    gs2 = state2.gs
    # every hot point cloned or split; population grows
    assert int(gs2.n_alive) > n0
    assert int(gs2.n_alive) <= capacity
    # stats reset
    assert float(gs2.xyz_gradient_accum.sum()) == 0.0
    assert float(gs2.denom.sum()) == 0.0
    # moments at newly-used slots are zero
    newly = np.asarray(gs2.alive & ~gs.alive)
    mu_xyz = np.asarray(state2.opt.mu["xyz"])
    assert np.all(mu_xyz[newly] == 0.0)


def test_opacity_reset():
    means, *_ = gt_scene(n=40)
    gs = sgs.create_from_pcd(np.asarray(means), 0.5 * np.ones((40, 3)), 64)
    state = init_scene_train_state(gs)
    state2, _ = scene_densify_step(
        state, jax.random.PRNGKey(0), 4.0, grad_threshold=10.0,
        min_opacity=0.0001, do_reset_opacity=True)
    op = jax.nn.sigmoid(state2.gs.opacity[:, 0])
    alive = np.asarray(state2.gs.alive)
    assert np.all(np.asarray(op)[alive] <= 0.0101)


def test_only_rgb_mode():
    """only_rgb stores raw RGB in the DC slot and scene_forward emits a
    (N, 3) precomputed color which render() consumes bypassing SH
    (reference scene.py:130-137,170-173)."""
    import jax
    import jax.numpy as jnp
    from hugs_tpu.models import scene_gs as sgs
    from hugs_tpu.render import render, make_camera

    pts = jnp.array([[0.0, 0.0, 3.0], [0.3, 0.1, 3.5], [-0.2, 0.2, 4.0]])
    cols = jnp.array([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9]])
    gs = sgs.create_from_pcd(pts, cols, capacity=8, only_rgb=True)
    np.testing.assert_allclose(np.asarray(gs.features_dc[:3, 0]),
                               np.asarray(cols), atol=1e-6)
    out = sgs.scene_forward(gs, only_rgb=True)
    assert out["shs"].shape == (8, 3)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.8, 0.6)
    img = render(out["xyz"], out["scales"], out["rotq"], out["opacity"],
                 out["shs"], cam, 32, 24, alive=out["alive"],
                 instance_budget=4096, tile_cap=64)["render"]
    assert np.isfinite(np.asarray(img)).all()
