"""Stage-level timing of the FLAGSHIP joint train step on chip.

Times each piece of the hugs_human_scene step at flagship shapes
(131072-capacity human, ~69k alive; 100k scene; 960x540) with the
chained-fori_loop method (relay-noise-free, scripts/micro_loop.py):
canonical decode, posed forward, the LBS-GT kNN, render passes, SSIM,
and the full joint_train_step. Guides which stage to optimize before the
release-length run.

Run (TPU env):  nohup timeout 3000 python scripts/micro_joint.py \
                    > /tmp/micro_joint.log 2>&1 &
Writes evidence/micro_joint.json.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SMOKE = bool(int(os.environ.get("MJ_SMOKE", "0")))
W, H = (96, 64) if SMOKE else (960, 540)
VPB = 4 if SMOKE else 288
N_SUBDIV = 1 if SMOKE else 2
H_CAP = 512 if SMOKE else 131072
N_SCENE = 256 if SMOKE else 100_000
IBUDGET = (1 << 14) if SMOKE else 393216
ITERS = 2 if SMOKE else 8


def timed(name, fn, *args, iters=ITERS, results=None):
    """Chained timing: fn must map carry -> carry-shaped output."""
    @jax.jit
    def block(x):
        return jax.lax.fori_loop(0, iters, lambda i, c: fn(c), x)

    x = jax.block_until_ready(block(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(block(*args))
        best = min(best, time.time() - t0)
    ms = best / iters * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    if results is not None:
        results[name] = round(ms, 3)
    return x


def main():
    from hugs_tpu.models import human_gs as hgs
    from hugs_tpu.models import scene_gs as sgs
    from hugs_tpu.models.smpl import synthetic_smpl
    from hugs_tpu.models.subdivide import subdivide_smpl_model
    from hugs_tpu.render import render_human_scene
    from hugs_tpu.losses.basic import ssim
    from hugs_tpu.losses.loss import HumanSceneLoss
    from hugs_tpu.data.cameras import get_rotating_camera
    from hugs_tpu.train.human_step import init_human_train_state, \
        make_human_lrs
    from hugs_tpu.train.scene_step import init_scene_train_state, \
        make_scene_lrs
    from hugs_tpu.train.joint_step import JointTrainState, joint_train_step
    from hugs_tpu.cfg import default_config

    rng = np.random.RandomState(0)
    smpl = synthetic_smpl(verts_per_bone=VPB)
    template = subdivide_smpl_model(smpl, smoothing=True, n_iter=N_SUBDIV)
    betas = jnp.zeros(10)
    cfg = hgs.HumanGSConfig(use_deformer=True, disable_posedirs=True)
    key = jax.random.PRNGKey(0)
    params, state, fixed, _ = hgs.init_human_gs(
        key, cfg, smpl, template, betas, n_frames=4, capacity=H_CAP)
    print(f"human alive {int(jnp.sum(state.alive))} / cap {H_CAP}",
          flush=True)

    pts = rng.uniform(-4, 4, (N_SCENE, 3)).astype(np.float32)
    cols = rng.rand(N_SCENE, 3).astype(np.float32)
    gs = sgs.create_from_pcd(jnp.asarray(pts), jnp.asarray(cols),
                             N_SCENE, max_sh_degree=3)
    cam = get_rotating_camera(img_size=(H, W), fov=0.95, dist=3.0,
                              nframes=2)[0]["camera"]
    bg = jnp.zeros(3)
    pose0 = jnp.zeros(69)
    res = {}

    # 1. canonical decode (triplane grid_sample + 3 decoders), fwd
    def canon_fwd(p):
        c = hgs.canon_forward(params._replace(
            xyz=params.xyz + 1e-30 * p.mean()), state, cfg)
        return p + 1e-30 * c["xyz_offsets"].mean()
    timed("canon_fwd", canon_fwd, pose0, results=res)

    # 2. full posed human forward
    def human_fwd(p):
        out = hgs.human_forward(params, state, fixed, cfg,
                                global_orient=jnp.zeros(3), body_pose=p,
                                betas=betas, transl=jnp.zeros(3),
                                smpl_scale=jnp.float32(1.0))
        return p + 1e-30 * out["xyz"].mean()
    timed("human_fwd", human_fwd, pose0, results=res)

    # 3. human forward + backward (grad wrt triplane + xyz)
    def human_fwd_bwd(p):
        def loss(pr):
            out = hgs.human_forward(pr, state, fixed, cfg,
                                    global_orient=jnp.zeros(3), body_pose=p,
                                    betas=betas, transl=jnp.zeros(3),
                                    smpl_scale=jnp.float32(1.0))
            return out["xyz"].mean() + out["shs"].mean() \
                + out["opacity"].mean()
        g = jax.grad(loss)(params)
        return p + 1e-30 * g.xyz.mean()
    timed("human_fwd_bwd", human_fwd_bwd, pose0, results=res)

    # 4. the LBS-GT kNN alone (smpl_lbsweight_top_k, no grads)
    tmpl_verts = fixed.vitruvian_verts
    lbsw = fixed.smpl.lbs_weights
    def knn_gt(p):
        w = hgs.smpl_lbsweight_top_k(
            lbsw, params.xyz + 1e-30 * p.mean(), tmpl_verts)[0]
        return p + 1e-30 * w.mean()
    timed("knn_gt_weights", knn_gt, pose0, results=res)

    # 5. merged render fwd / fwd+bwd
    h_out0 = hgs.human_forward(params, state, fixed, cfg,
                               global_orient=jnp.zeros(3), body_pose=pose0,
                               betas=betas, transl=jnp.zeros(3),
                               smpl_scale=jnp.float32(1.0))
    s_out0 = sgs.scene_forward(gs)
    data = {"camera": cam, "width": W, "height": H}

    def rhs_fwd(p):
        h = dict(h_out0)
        h["xyz"] = h["xyz"] + 1e-30 * p.mean()
        pkg = render_human_scene(data, h, s_out0, bg_color=bg,
                                 render_mode="human_scene",
                                 backend="pallas",
                                 instance_budget=IBUDGET)
        return p + 1e-30 * pkg["render"].mean()
    timed("render_fwd", rhs_fwd, pose0, results=res)

    target = jnp.zeros((3, H, W))
    def rhs_fwd_bwd(p):
        def loss(x):
            h = dict(h_out0)
            h["xyz"] = h["xyz"] + x
            pkg = render_human_scene(data, h, s_out0, bg_color=bg,
                                     render_mode="human_scene",
                                     backend="pallas",
                                     instance_budget=IBUDGET)
            return jnp.mean(jnp.abs(pkg["render"] - target))
        g = jax.grad(loss)(jnp.zeros(3) + 1e-30 * p.mean())
        return p + 1e-30 * g.mean()
    timed("render_fwd_bwd", rhs_fwd_bwd, pose0, results=res)

    # 6. SSIM fwd+bwd at 540p
    img = jnp.asarray(rng.rand(3, H, W), jnp.float32)
    def ssim_fwd_bwd(p):
        g = jax.grad(lambda x: ssim(x, target))(img + 1e-30 * p.mean())
        return p + 1e-30 * g.mean()
    timed("ssim_fwd_bwd", ssim_fwd_bwd, pose0, results=res)

    # 7. full joint step (release loss shape, humansep on)
    lrcfg = default_config()
    h_static, h_sched = make_human_lrs(lrcfg.human.lr, optim_pose=True,
                                       optim_trans=True)
    s_static, s_sched = make_scene_lrs(lrcfg.scene.lr, 4.0)
    loss_fn = HumanSceneLoss(l_ssim_w=0.2, l_l1_w=0.8, l_lpips_w=0.0,
                             l_lbs_w=1000.0, l_humansep_w=1.0,
                             use_patches=False)
    jstate0 = JointTrainState(human=init_human_train_state(params, state),
                              scene=init_scene_train_state(gs))
    mask = jnp.zeros((H, W))

    def step_fn(js):
        js2, aux = joint_train_step(
            js, fixed, cam, target, mask, bg, bg, jnp.float32(1.0),
            jnp.int32(0), jax.random.PRNGKey(1),
            jnp.float32(1e-4), h_static, jnp.float32(1e-4), s_static,
            cfg=cfg, loss_fn=loss_fn, width=W, height=H,
            backend="pallas", instance_budget=IBUDGET,
            render_human_separate=True)
        return js2
    timed("joint_step_full", step_fn, jstate0, iters=max(ITERS // 2, 1),
          results=res)

    res["device"] = jax.devices()[0].platform
    res["shapes"] = f"cap={H_CAP} scene={N_SCENE} {W}x{H} " \
                    f"budget={IBUDGET}"
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    with open(os.path.join(ev, "micro_joint.json"), "w") as fo:
        json.dump(res, fo, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
