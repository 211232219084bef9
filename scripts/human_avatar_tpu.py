"""Human-avatar pipeline convergence on TPU (flagship HUGS capability).

Trains the full HUGS_TRIMLP avatar — triplane + appearance/geometry/
deformation decoders, vitruvian canonicalization, LBS posing, learned
per-frame pose refinement — against a synthetic articulated GT body
(colored striped splats on a posed synthetic-SMPL mesh) over 24
(pose, orbit-camera) frames at 512x512, then evaluates held-out
(pose, view) frames the model never saw. The reference's equivalent
flow is hugs_trimlp + gs_trainer human mode (hugs/models/hugs_trimlp.py,
hugs/trainer/gs_trainer.py:316-420); the GT here stands in for the
NeuMan 4D-humans frames (no real datasets in this environment).

Writes evidence/human_training_tpu.json + human_gt/fit pngs.

Run (default TPU env):
    PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 4000 \
        python scripts/human_avatar_tpu.py > /tmp/human.log 2>&1 &
CPU smoke: HUMAN_TPU_SMOKE=1 + local-CPU env.
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

SMOKE = bool(int(os.environ.get("HUMAN_TPU_SMOKE", "0")))
W = H = 64 if SMOKE else 512
F = 4 if SMOKE else 24
STEPS = 30 if SMOKE else 2000
DISTILL = 60 if SMOKE else 1500
VAL_EVERY = 10 if SMOKE else 250
BUDGET = 1 << 14 if SMOKE else 1 << 17


def gt_poses(f, n):
    """Smooth swing of arms/legs + slow torso twist, frame f of n."""
    t = 2.0 * np.pi * f / n
    pose = np.zeros(69, np.float32)
    # SMPL body joints (0-indexed into the 23 body joints):
    # 0/1 hips, 3/4 knees, 15/16 shoulders, 17/18 elbows, 8 spine3
    pose[0 * 3 + 0] = 0.35 * np.sin(t)            # L hip swing (x)
    pose[1 * 3 + 0] = -0.35 * np.sin(t)           # R hip swing
    pose[3 * 3 + 0] = 0.5 * max(0.0, np.sin(t))   # L knee
    pose[4 * 3 + 0] = 0.5 * max(0.0, -np.sin(t))  # R knee
    pose[15 * 3 + 2] = 0.6 * np.sin(t)            # L shoulder (z)
    pose[16 * 3 + 2] = -0.6 * np.sin(t)           # R shoulder
    pose[17 * 3 + 1] = 0.4 * np.cos(t)            # L elbow
    pose[18 * 3 + 1] = -0.4 * np.cos(t)           # R elbow
    pose[8 * 3 + 1] = 0.2 * np.sin(2 * t)         # spine twist
    orient = np.array([0.0, 0.15 * np.sin(t), 0.0], np.float32)
    return pose, orient


def main():
    from hugs_tpu.data.cameras import get_rotating_camera
    from hugs_tpu.losses.basic import psnr
    from hugs_tpu.losses.loss import HumanSceneLoss
    from hugs_tpu.models import human_gs as hgs
    from hugs_tpu.models.smpl import synthetic_smpl, smpl_forward
    from hugs_tpu.ops.knn import mean_sq_dist_to_knn
    from hugs_tpu.render import render
    from hugs_tpu.train.human_step import (
        init_human_train_state, human_train_step, distill_init,
        make_human_lrs)
    from hugs_tpu.cfg import default_config
    from hugs_tpu.utils.image import save_png

    smpl = synthetic_smpl(verts_per_bone=24)     # 576 verts
    betas = jnp.zeros(10)

    # ---- GT avatar: striped splats glued to the posed mesh ----
    vt = np.asarray(smpl.v_template)
    col = np.stack([0.5 + 0.45 * np.sin(25.0 * vt[:, 1]),
                    0.5 + 0.45 * np.sin(20.0 * vt[:, 0] + 2.0),
                    0.5 + 0.45 * np.cos(18.0 * vt[:, 2] + 4.0)], axis=1)
    shs = np.zeros((vt.shape[0], 16, 3), np.float32)
    shs[:, 0, :] = (np.clip(col, 0, 1) - 0.5) / 0.28209479177387814
    shs = jnp.asarray(shs)
    d2 = mean_sq_dist_to_knn(jnp.asarray(vt), k=3)
    gt_scales = jnp.tile(jnp.sqrt(jnp.clip(d2, 1e-8))[:, None] * 0.9, (1, 3))
    gt_rotq = jnp.tile(jnp.array([1.0, 0, 0, 0]), (vt.shape[0], 1))
    gt_op = jnp.full(vt.shape[0], 0.95)

    cams = get_rotating_camera(img_size=(H, W), fov=0.95, dist=2.6,
                               nframes=F + 1, angle_limit=2 * np.pi)[:-1]

    @jax.jit
    def render_gt(pose, orient, camera, bg):
        out = smpl_forward(smpl, betas, pose, orient, jnp.zeros(3))
        return render(out.vertices, gt_scales, gt_rotq, gt_op, shs,
                      camera, W, H, bg=bg, active_sh_degree=0,
                      instance_budget=BUDGET, backend="pallas",
                      tile=32)["render"]

    frames = []
    for f in range(F):
        pose, orient = gt_poses(f, F)
        pose, orient = jnp.asarray(pose), jnp.asarray(orient)
        cam = cams[f]["camera"]
        img0 = render_gt(pose, orient, cam, jnp.zeros(3))
        img1 = render_gt(pose, orient, cam, jnp.ones(3))
        t_map = jnp.clip((img1 - img0).mean(0), 0.0, 1.0)  # transmittance
        mask = (t_map < 0.5).astype(jnp.float32)           # (H, W)
        frames.append({"pose": pose, "orient": orient, "camera": cam,
                       "rgb": img0, "mask": mask})
    print("GT:", F, "frames, mean", float(np.mean(
        [float(f['rgb'].mean()) for f in frames])),
        "mask%", float(np.mean([float(f['mask'].mean()) for f in frames])),
        flush=True)

    held_i = [i for i in range(F) if i % 6 == 3]
    train_i = [i for i in range(F) if i % 6 != 3]

    # ---- model ----
    key = jax.random.PRNGKey(0)
    cfg = hgs.HumanGSConfig(use_deformer=True, disable_posedirs=True)
    all_pose = jnp.stack([jnp.asarray(gt_poses(f, F)[0]) for f in range(F)])
    all_orient = jnp.stack([jnp.asarray(gt_poses(f, F)[1])
                            for f in range(F)])
    params, state, fixed, init_values = hgs.init_human_gs(
        key, cfg, smpl, smpl, betas, n_frames=F, capacity=1024,
        init_body_pose=all_pose, init_global_orient=all_orient,
        init_transl=jnp.zeros((F, 3)))
    params = distill_init(params, state, init_values, cfg,
                          num_steps=DISTILL, log_every=500)
    tstate = init_human_train_state(params, state)

    lrcfg = default_config().human.lr
    static_lrs, sched = make_human_lrs(lrcfg, optim_pose=True,
                                       optim_trans=False)
    loss_fn = HumanSceneLoss(l_ssim_w=0.2, l_l1_w=0.8, l_lpips_w=0.0,
                             l_lbs_w=10.0, use_patches=False)

    def eval_held(tstate):
        """Held frames rendered with the GT pose (the reference's val
        path takes dataset SMPL params, gs_trainer.py:469-505)."""
        ps = []
        for i in held_i:
            fr = frames[i]
            out = hgs.human_forward(tstate.params, tstate.state, fixed,
                                    cfg, global_orient=fr["orient"],
                                    body_pose=fr["pose"], betas=betas,
                                    transl=jnp.zeros(3),
                                    smpl_scale=jnp.float32(1.0))
            img = render(out["xyz"], out["scales"], out["rotq"],
                         out["opacity"], out["shs"], fr["camera"], W, H,
                         bg=jnp.zeros(3), alive=out["alive"],
                         active_sh_degree=out["active_sh_degree"],
                         instance_budget=BUDGET, backend="pallas",
                         tile=32)["render"]
            ps.append(float(psnr(img, fr["rgb"])))
        return float(np.mean(ps))

    curve = [{"step": 0, "psnr_held": round(eval_held(tstate), 2)}]
    print("step 0 psnr", curve[0], flush=True)

    t0 = time.time()
    for step in range(1, STEPS + 1):
        i = train_i[step % len(train_i)]
        fr = frames[i]
        key, k = jax.random.split(key)
        bg = jax.random.uniform(k, (3,))
        gt = fr["rgb"] * fr["mask"][None] + bg[:, None, None] \
            * (1.0 - fr["mask"][None])
        tstate, aux = human_train_step(
            tstate, fixed, fr["camera"], gt, fr["mask"], bg,
            jnp.float32(1.0), jnp.int32(i), k,
            jnp.float32(sched(step)), static_lrs,
            cfg=cfg, loss_fn=loss_fn, width=W, height=H,
            backend="pallas", tile=32, instance_budget=BUDGET)
        if step % VAL_EVERY == 0:
            p = eval_held(tstate)
            curve.append({"step": step, "psnr_held": round(p, 2)})
            print(f"step {step} loss {float(aux['loss']):.4f} "
                  f"psnr_held {p:.2f} t {time.time()-t0:.0f}s", flush=True)
    wall = time.time() - t0

    out = {
        "workload": f"HUGS avatar (triplane+LBS+pose-refine), "
                    f"{len(train_i)} train / {len(held_i)} held "
                    f"(pose, view) frames, {W}x{H}, pallas",
        "steps_per_s": round(STEPS / wall, 2),
        "wall_s": round(wall, 1),
        "psnr_curve": curve,
        "device": jax.devices()[0].platform,
    }
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    with open(os.path.join(ev, "human_training_tpu.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out), flush=True)

    fr = frames[held_i[0]]
    o = hgs.human_forward(tstate.params, tstate.state, fixed, cfg,
                          global_orient=fr["orient"], body_pose=fr["pose"],
                          betas=betas, transl=jnp.zeros(3),
                          smpl_scale=jnp.float32(1.0))
    img = render(o["xyz"], o["scales"], o["rotq"], o["opacity"], o["shs"],
                 fr["camera"], W, H, bg=jnp.zeros(3), alive=o["alive"],
                 active_sh_degree=o["active_sh_degree"],
                 instance_budget=BUDGET, backend="pallas",
                 tile=32)["render"]
    save_png(np.asarray(img), os.path.join(ev, "human_fit_final.png"))
    save_png(np.asarray(fr["rgb"]), os.path.join(ev, "human_gt.png"))

    # ---- novel-pose animation strip (the animate/AMASS-mocap analog:
    # drive the trained avatar through poses at phases the training set
    # never contained; reference anim loop gs_trainer.py:539-586) ----
    n_anim = 8
    strip = []
    cam0 = frames[0]["camera"]
    for a in range(n_anim):
        # phase offset 0.5/n_anim lands between every training phase
        pose, orient = gt_poses(a + 0.5, n_anim)
        oo = hgs.human_forward(tstate.params, tstate.state, fixed, cfg,
                               global_orient=jnp.asarray(orient),
                               body_pose=jnp.asarray(pose), betas=betas,
                               transl=jnp.zeros(3),
                               smpl_scale=jnp.float32(1.0))
        im = render(oo["xyz"], oo["scales"], oo["rotq"], oo["opacity"],
                    oo["shs"], cam0, W, H, bg=jnp.zeros(3),
                    alive=oo["alive"],
                    active_sh_degree=oo["active_sh_degree"],
                    instance_budget=BUDGET, backend="pallas",
                    tile=32)["render"]
        strip.append(np.asarray(im))
    save_png(np.concatenate(strip, axis=2),
             os.path.join(ev, "human_anim_strip.png"))


if __name__ == "__main__":
    main()
