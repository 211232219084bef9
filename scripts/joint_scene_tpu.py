"""Joint human+scene training convergence on TPU (the flagship
hugs_human_scene release configuration, end to end).

Trains BOTH Gaussian sets through the merged depth-sorted render with the
release loss shape — L1 0.8 + SSIM 0.2 + LBS 10 + humansep 1.0 (LPIPS 0:
no pretrained weights in this env) — via train/joint_step.py, against a
synthetic monocular-video stand-in: an articulated striped human orbited
by the camera inside a static procedurally-colored room (background
sphere + floor disc, the bg-sphere trick of the reference's
hugs/datasets/neuman.py:246-273). Held-out (pose, view) frames the model
never saw measure generalization of the JOINT reconstruction. The
reference's equivalent flow is gs_trainer mode='human_scene'
(hugs/trainer/gs_trainer.py:218-351) on NeuMan frames (no real datasets
in this environment).

Writes evidence/joint_training_tpu.json + joint_gt/fit pngs.

Run (default TPU env):
    PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 4000 \
        python scripts/joint_scene_tpu.py > /tmp/joint.log 2>&1 &
CPU smoke: JOINT_TPU_SMOKE=1 + local-CPU env.
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

SMOKE = bool(int(os.environ.get("JOINT_TPU_SMOKE", "0")))
W = H = 64 if SMOKE else 512
F = 4 if SMOKE else 24
STEPS = 8 if SMOKE else 1500
DISTILL = 40 if SMOKE else 1500
VAL_EVERY = 4 if SMOKE else 250
BUDGET = 1 << 14 if SMOKE else 1 << 17
N_SPHERE = 256 if SMOKE else 6000
N_FLOOR = 64 if SMOKE else 2000
SCENE_CAP = 512 if SMOKE else 8192


def gt_poses(f, n):
    """Same articulated swing as scripts/human_avatar_tpu.py."""
    t = 2.0 * np.pi * f / n
    pose = np.zeros(69, np.float32)
    pose[0 * 3 + 0] = 0.35 * np.sin(t)
    pose[1 * 3 + 0] = -0.35 * np.sin(t)
    pose[3 * 3 + 0] = 0.5 * max(0.0, np.sin(t))
    pose[4 * 3 + 0] = 0.5 * max(0.0, -np.sin(t))
    pose[15 * 3 + 2] = 0.6 * np.sin(t)
    pose[16 * 3 + 2] = -0.6 * np.sin(t)
    pose[17 * 3 + 1] = 0.4 * np.cos(t)
    pose[18 * 3 + 1] = -0.4 * np.cos(t)
    pose[8 * 3 + 1] = 0.2 * np.sin(2 * t)
    orient = np.array([0.0, 0.15 * np.sin(t), 0.0], np.float32)
    return pose, orient


def scene_points(rng):
    """Static room: bg sphere (radius 5) + floor disc (radius 2.4,
    y=-1.25), procedurally striped so the scene model has real texture
    to reconstruct."""
    u = rng.normal(size=(N_SPHERE, 3))
    sph = 5.0 * u / np.linalg.norm(u, axis=1, keepdims=True)
    r = np.sqrt(rng.uniform(0.05, 1.0, N_FLOOR)) * 2.4
    th = rng.uniform(0, 2 * np.pi, N_FLOOR)
    floor = np.stack([r * np.cos(th), np.full(N_FLOOR, -1.25),
                      r * np.sin(th)], axis=1)
    pts = np.concatenate([sph, floor]).astype(np.float32)
    col = np.stack([0.5 + 0.35 * np.sin(3.0 * pts[:, 0]),
                    0.5 + 0.35 * np.sin(2.0 * pts[:, 1] + 1.0),
                    0.5 + 0.35 * np.cos(2.5 * pts[:, 2] + 3.0)], axis=1)
    return pts, np.clip(col, 0.0, 1.0).astype(np.float32)


def main():
    from hugs_tpu.data.cameras import get_rotating_camera
    from hugs_tpu.losses.basic import psnr
    from hugs_tpu.losses.loss import HumanSceneLoss
    from hugs_tpu.models import human_gs as hgs
    from hugs_tpu.models import scene_gs as sgs
    from hugs_tpu.models.smpl import synthetic_smpl, smpl_forward
    from hugs_tpu.ops.knn import mean_sq_dist_to_knn
    from hugs_tpu.render import render, render_human_scene
    from hugs_tpu.train.human_step import (
        init_human_train_state, distill_init, make_human_lrs)
    from hugs_tpu.train.scene_step import (
        init_scene_train_state, make_scene_lrs)
    from hugs_tpu.train.joint_step import JointTrainState, joint_train_step
    from hugs_tpu.cfg import default_config
    from hugs_tpu.utils.image import save_png

    rng = np.random.RandomState(0)
    smpl = synthetic_smpl(verts_per_bone=24)     # 576 verts
    betas = jnp.zeros(10)
    bg = jnp.full(3, 0.2)                        # fixed bg (sphere covers
    #                                              the view; see GT note)

    # ---- GT human: striped splats on the posed mesh ----
    vt = np.asarray(smpl.v_template)
    hcol = np.stack([0.5 + 0.45 * np.sin(25.0 * vt[:, 1]),
                     0.5 + 0.45 * np.sin(20.0 * vt[:, 0] + 2.0),
                     0.5 + 0.45 * np.cos(18.0 * vt[:, 2] + 4.0)], axis=1)
    d2h = mean_sq_dist_to_knn(jnp.asarray(vt), k=3)
    h_scales = jnp.tile(jnp.sqrt(jnp.clip(d2h, 1e-8))[:, None] * 0.9,
                        (1, 3))
    # ---- GT scene: striped room splats ----
    spts, scol = scene_points(rng)
    d2s = mean_sq_dist_to_knn(jnp.asarray(spts), k=3)
    s_scales = jnp.tile(jnp.sqrt(jnp.clip(d2s, 1e-8))[:, None] * 1.2,
                        (1, 3))

    def sh0(col):
        out = np.zeros((col.shape[0], 16, 3), np.float32)
        out[:, 0, :] = (col - 0.5) / 0.28209479177387814
        return jnp.asarray(out)

    h_shs, s_shs = sh0(hcol), sh0(scol)
    s_pts = jnp.asarray(spts)
    idq = jnp.array([1.0, 0, 0, 0])

    cams = get_rotating_camera(img_size=(H, W), fov=0.95, dist=2.6,
                               nframes=F + 1, angle_limit=2 * np.pi)[:-1]

    @jax.jit
    def render_gt(pose, orient, camera):
        out = smpl_forward(smpl, betas, pose, orient, jnp.zeros(3))
        xyz = jnp.concatenate([out.vertices, s_pts])
        scales = jnp.concatenate([h_scales, s_scales])
        rotq = jnp.tile(idq, (xyz.shape[0], 1))
        op = jnp.full(xyz.shape[0], 0.95)
        shs = jnp.concatenate([h_shs, s_shs])
        full = render(xyz, scales, rotq, op, shs, camera, W, H, bg=bg,
                      active_sh_degree=0, instance_budget=BUDGET,
                      backend="pallas", tile=32)["render"]
        # human mask from the human-only transmittance (bg0 vs bg1 trick)
        hq = jnp.tile(idq, (out.vertices.shape[0], 1))
        hop = jnp.full(out.vertices.shape[0], 0.95)
        i0 = render(out.vertices, h_scales, hq, hop, h_shs, camera, W, H,
                    bg=jnp.zeros(3), active_sh_degree=0,
                    instance_budget=BUDGET, backend="pallas",
                    tile=32)["render"]
        i1 = render(out.vertices, h_scales, hq, hop, h_shs, camera, W, H,
                    bg=jnp.ones(3), active_sh_degree=0,
                    instance_budget=BUDGET, backend="pallas",
                    tile=32)["render"]
        mask = (jnp.clip((i1 - i0).mean(0), 0, 1) < 0.5).astype(jnp.float32)
        return full, mask

    frames = []
    for f in range(F):
        pose, orient = gt_poses(f, F)
        pose, orient = jnp.asarray(pose), jnp.asarray(orient)
        cam = cams[f]["camera"]
        img, mask = render_gt(pose, orient, cam)
        frames.append({"pose": pose, "orient": orient, "camera": cam,
                       "rgb": img, "mask": mask})
    print("GT:", F, "frames, mean", float(np.mean(
        [float(f['rgb'].mean()) for f in frames])), "mask%",
        float(np.mean([float(f['mask'].mean()) for f in frames])),
        flush=True)

    held_i = [i for i in range(F) if i % 6 == 3]
    train_i = [i for i in range(F) if i % 6 != 3]

    # ---- models ----
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
    # scene model from a noisy observation of the room point cloud
    s_init = spts + rng.normal(size=spts.shape).astype(np.float32) * 0.05
    c_init = np.clip(scol + rng.normal(size=scol.shape).astype(
        np.float32) * 0.1, 0, 1)
    gs = sgs.create_from_pcd(jnp.asarray(s_init), jnp.asarray(c_init),
                             SCENE_CAP, max_sh_degree=3)
    jstate = JointTrainState(human=init_human_train_state(params, state),
                             scene=init_scene_train_state(gs))

    lrcfg = default_config()
    h_static, h_sched = make_human_lrs(lrcfg.human.lr, optim_pose=True,
                                       optim_trans=False)
    s_static, s_sched = make_scene_lrs(lrcfg.scene.lr, 5.0)
    loss_fn = HumanSceneLoss(l_ssim_w=0.2, l_l1_w=0.8, l_lpips_w=0.0,
                             l_lbs_w=10.0, l_humansep_w=1.0,
                             use_patches=False)

    def eval_held(jstate):
        ps = []
        for i in held_i:
            fr = frames[i]
            h_out = hgs.human_forward(
                jstate.human.params, jstate.human.state, fixed, cfg,
                global_orient=fr["orient"], body_pose=fr["pose"],
                betas=betas, transl=jnp.zeros(3),
                smpl_scale=jnp.float32(1.0))
            s_out = sgs.scene_forward(jstate.scene.gs)
            data = {"camera": fr["camera"], "width": W, "height": H}
            pkg = render_human_scene(
                data, h_out, s_out, bg_color=bg, render_mode="human_scene",
                backend="pallas", instance_budget=BUDGET, tile=32)
            ps.append(float(psnr(pkg["render"], fr["rgb"])))
        return float(np.mean(ps))

    curve = [{"step": 0, "psnr_held": round(eval_held(jstate), 2)}]
    print("step 0 psnr", curve[0], flush=True)

    t0 = time.time()
    for step in range(1, STEPS + 1):
        i = train_i[step % len(train_i)]
        fr = frames[i]
        key, k = jax.random.split(key)
        hbg = jax.random.uniform(k, (3,))
        jstate, aux = joint_train_step(
            jstate, fixed, fr["camera"], fr["rgb"], fr["mask"], bg, hbg,
            jnp.float32(1.0), jnp.int32(i), k,
            jnp.float32(h_sched(step)), h_static,
            jnp.float32(s_sched(step)), s_static,
            cfg=cfg, loss_fn=loss_fn, width=W, height=H,
            backend="pallas", instance_budget=BUDGET, tile=32,
            render_human_separate=True)
        if step % VAL_EVERY == 0:
            p = eval_held(jstate)
            curve.append({"step": step, "psnr_held": round(p, 2)})
            print(f"step {step} loss {float(aux['loss']):.4f} "
                  f"psnr_held {p:.2f} t {time.time()-t0:.0f}s", flush=True)
    wall = time.time() - t0

    out = {
        "workload": f"JOINT human+scene (release loss: l1 .8 + ssim .2 + "
                    f"lbs 10 + humansep 1), {len(train_i)} train / "
                    f"{len(held_i)} held (pose, view) frames, {W}x{H}, "
                    f"pallas",
        "steps_per_s": round(STEPS / wall, 2),
        "wall_s": round(wall, 1),
        "psnr_curve": curve,
        "device": jax.devices()[0].platform,
    }
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    with open(os.path.join(ev, "joint_training_tpu.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out), flush=True)

    fr = frames[held_i[0]]
    h_out = hgs.human_forward(jstate.human.params, jstate.human.state,
                              fixed, cfg, global_orient=fr["orient"],
                              body_pose=fr["pose"], betas=betas,
                              transl=jnp.zeros(3),
                              smpl_scale=jnp.float32(1.0))
    s_out = sgs.scene_forward(jstate.scene.gs)
    data = {"camera": fr["camera"], "width": W, "height": H}
    pkg = render_human_scene(data, h_out, s_out, bg_color=bg,
                             render_mode="human_scene", backend="pallas",
                             instance_budget=BUDGET, tile=32)
    save_png(np.asarray(pkg["render"]),
             os.path.join(ev, "joint_fit_final.png"))
    save_png(np.asarray(fr["rgb"]), os.path.join(ev, "joint_gt.png"))


if __name__ == "__main__":
    main()
