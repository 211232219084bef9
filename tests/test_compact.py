"""Serving-time capacity compaction (scene_gs.compact /
human_gs.compact_for_inference): gathering alive rows into a smaller
pow2 bucket must not change the rendered image — the padded dead rows
were never visible, only paid for (projection/binning/skinning row tax
measured 6x on the flagship checkpoint; see scripts/fps_bench_tpu.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from hugs_tpu.models import human_gs as hgs
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.models.smpl import synthetic_smpl
from hugs_tpu.models.subdivide import subdivide_smpl_model
from hugs_tpu.render import render, render_human_scene
from hugs_tpu.data.cameras import get_rotating_camera

W, H = 64, 48
BETAS = jnp.zeros(10)


def _camera():
    return get_rotating_camera(img_size=(H, W), fov=0.9, dist=3.0,
                               nframes=2)[0]["camera"]


def _scene_with_holes(capacity=256, n=90, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.rand(n, 3).astype(np.float32)
    gs = sgs.create_from_pcd(jnp.asarray(pts), jnp.asarray(cols),
                             capacity, max_sh_degree=3)
    # punch holes so alive is non-contiguous (as after prune)
    alive = np.asarray(gs.alive).copy()
    alive[rng.choice(n, size=n // 3, replace=False)] = False
    return gs._replace(alive=jnp.asarray(alive))


def _render_scene(gs):
    out = sgs.scene_forward(gs)
    return render(out["xyz"], out["scales"], out["rotq"], out["opacity"],
                  out["shs"], camera=_camera(), width=W, height=H,
                  bg=jnp.zeros(3), active_sh_degree=3,
                  alive=out["alive"], instance_budget=4096)["render"]


def test_scene_compact_render_identical():
    gs = _scene_with_holes()
    img_full = _render_scene(gs)
    small = sgs.compact(gs)
    assert small.capacity == 128          # pow2 bucket over 60 alive
    assert int(small.n_alive) == int(gs.n_alive)
    img_small = _render_scene(small)
    np.testing.assert_allclose(img_small, img_full, atol=1e-6)


def test_scene_compact_explicit_bucket_and_overflow():
    gs = _scene_with_holes()
    small = sgs.compact(gs, bucket=256)
    assert small.capacity == 256
    try:
        sgs.compact(gs, bucket=16)
        assert False, "bucket < alive must raise"
    except ValueError:
        pass


def test_human_compact_forward_identical():
    smpl = synthetic_smpl(verts_per_bone=4)
    template = subdivide_smpl_model(smpl, smoothing=True, n_iter=1)
    cfg = hgs.HumanGSConfig(n_features=8, triplane_res=32,
                            use_deformer=True, disable_posedirs=False)
    params, state, fixed, _ = hgs.init_human_gs(
        jax.random.PRNGKey(0), cfg, smpl, template, BETAS, n_frames=1,
        capacity=512)
    # punch holes
    alive = np.asarray(state.alive).copy()
    n0 = int(alive.sum())
    kill = np.random.RandomState(1).choice(
        np.flatnonzero(alive), size=n0 // 4, replace=False)
    alive[kill] = False
    state = state._replace(alive=jnp.asarray(alive))

    pose = jax.random.normal(jax.random.PRNGKey(2), (69,)) * 0.2
    canon = hgs.canon_forward(params, state, cfg)

    def fwd(p, s, c):
        h_out = hgs.human_forward(
            p, s, fixed, cfg, global_orient=jnp.zeros(3), body_pose=pose,
            betas=BETAS, transl=jnp.zeros(3), canon_out=c,
            compute_gt_lbs=False)
        return render(h_out["xyz"], h_out["scales"], h_out["rotq"],
                      h_out["opacity"], h_out["shs"], camera=_camera(),
                      width=W, height=H, bg=jnp.zeros(3),
                      active_sh_degree=0, alive=h_out["alive"],
                      instance_budget=4096)["render"]

    img_full = fwd(params, state, canon)
    cp, cs, cc = hgs.compact_for_inference(params, state, canon)
    assert cs.alive.shape[0] < state.alive.shape[0]
    assert int(jnp.sum(cs.alive)) == int(jnp.sum(state.alive))
    # posedirs keeps the (207, 3N) layout at the new N
    assert cc["posedirs"].shape == (207, 3 * cs.alive.shape[0])
    img_small = fwd(cp, cs, cc)
    np.testing.assert_allclose(img_small, img_full, atol=1e-5)


def test_render_poses_compaction_invisible():
    """render_poses compacts internally (trainer.py); its output must
    match the full-capacity render_frame for the same pose/camera."""
    from hugs_tpu.cfg import default_config
    from hugs_tpu.train.trainer import GaussianTrainer, render_poses

    cfg = default_config()
    cfg.mode = "human"
    cfg.human.triplane_res = 16
    cfg.human.n_subdivision = 0
    cfg.human.run_init = False
    cfg.tpu.human_capacity = 512
    cfg.tpu.smpl_vpb = 8
    cfg.tpu.tile_cap = 256
    cfg.tpu.instance_budget = 8192
    cfg.logdir = ""
    cfg.logdir_ckpt = ""
    tr = GaussianTrainer(cfg, None, None, None)

    cam = _camera()
    pose = np.zeros(69, np.float32)
    pose[3] = 0.4
    smpl_params = {"global_orient": np.zeros(3, np.float32),
                   "body_pose": pose,
                   "betas": np.zeros(10, np.float32),
                   "transl": np.zeros(3, np.float32),
                   "smpl_scale": np.float32(1.0)}
    imgs = render_poses(tr, [{"camera": cam, "width": W, "height": H}],
                        smpl_params, bg_color="black")
    assert len(imgs) == 1
    full = tr.render_frame(
        {"camera": cam, "width": W, "height": H, **smpl_params},
        render_mode="human", bg=jnp.zeros(3))["render"]
    np.testing.assert_allclose(imgs[0], np.asarray(full), atol=1e-5)


def test_pergs_compact_render_identical():
    from hugs_tpu.models.smpl import synthetic_smpl as _smpl
    from hugs_tpu.models import human_gs_pergs as pgs

    smpl = _smpl(verts_per_bone=12)
    params, fixed = pgs.init_human_pergs(smpl, smpl, jnp.zeros(10),
                                         n_frames=1, capacity=1024)
    # punch holes in the alive mask
    alive = np.asarray(params.gs.alive).copy()
    kill = np.random.RandomState(3).choice(
        np.flatnonzero(alive), size=30, replace=False)
    alive[kill] = False
    params = params._replace(gs=params.gs._replace(alive=jnp.asarray(alive)))

    def img_of(p):
        out = pgs.human_pergs_forward(p, fixed,
                                      smpl_scale=jnp.float32(1.0))
        return render(out["xyz"], out["scales"], out["rotq"],
                      out["opacity"], out["shs"], _camera(), W, H,
                      alive=out["alive"], tile_cap=256,
                      instance_budget=8192)["render"]

    full = img_of(params)
    small = pgs.compact_for_inference(params)
    assert small.gs.capacity < params.gs.capacity
    np.testing.assert_allclose(img_of(small), full, atol=1e-6)


def test_human_scene_compact_joint_render():
    smpl = synthetic_smpl(verts_per_bone=4)
    template = subdivide_smpl_model(smpl, smoothing=True, n_iter=1)
    cfg = hgs.HumanGSConfig(n_features=8, triplane_res=32,
                            use_deformer=True, disable_posedirs=True)
    params, state, fixed, _ = hgs.init_human_gs(
        jax.random.PRNGKey(0), cfg, smpl, template, BETAS, n_frames=1,
        capacity=512)
    gs = _scene_with_holes()
    canon = hgs.canon_forward(params, state, cfg)

    def joint(p, s, c, scene):
        h_out = hgs.human_forward(
            p, s, fixed, cfg, global_orient=jnp.zeros(3),
            body_pose=jnp.zeros(69), betas=BETAS, transl=jnp.zeros(3),
            canon_out=c, compute_gt_lbs=False)
        s_out = sgs.scene_forward(scene)
        return render_human_scene(
            {"camera": _camera(), "width": W, "height": H}, h_out, s_out,
            bg_color=jnp.zeros(3), render_mode="human_scene",
            backend="tiled", instance_budget=4096)["render"]

    img_full = joint(params, state, canon, gs)
    cp, cs, cc = hgs.compact_for_inference(params, state, canon)
    img_small = joint(cp, cs, cc, sgs.compact(gs))
    np.testing.assert_allclose(img_small, img_full, atol=1e-5)


def test_rehearse_budget_parity_and_guard():
    """rehearse_budget (eval-only) shrinks the instance budget to the
    measured slot demand; renders through the tightened closures must
    match the original-budget renders, and the mid-training guard
    fires without cfg.eval."""
    import pytest
    from hugs_tpu.cfg import default_config
    from hugs_tpu.train.trainer import GaussianTrainer

    cfg = default_config()
    cfg.mode = "human"
    cfg.human.triplane_res = 16
    cfg.human.n_subdivision = 0
    cfg.human.run_init = False
    cfg.tpu.human_capacity = 512
    cfg.tpu.smpl_vpb = 8
    cfg.tpu.tile_cap = 256
    cfg.tpu.instance_budget = 65536   # deliberately roomy
    cfg.logdir = ""
    cfg.logdir_ckpt = ""
    cfg.eval = True
    tr = GaussianTrainer(cfg, None, None, None)

    pose = np.zeros(69, np.float32)
    pose[3] = 0.4
    data = {"camera": _camera(), "width": W, "height": H,
            "global_orient": np.zeros(3, np.float32), "body_pose": pose,
            "betas": np.zeros(10, np.float32),
            "transl": np.zeros(3, np.float32),
            "smpl_scale": np.float32(1.0)}
    full = tr.render_frame(data, render_mode="human",
                           bg=jnp.zeros(3))["render"]
    b = tr.rehearse_budget([data])
    assert b == tr._ibudget and b < 65536
    tight = tr.render_frame(data, render_mode="human",
                            bg=jnp.zeros(3))["render"]
    np.testing.assert_allclose(np.asarray(tight), np.asarray(full),
                               atol=1e-5)

    tr.cfg.eval = False
    with pytest.raises(RuntimeError):
        tr.rehearse_budget([data])
