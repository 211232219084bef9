"""FLAGSHIP: release-length HUGS training on ONE TPU chip, end to end,
through the real GaussianTrainer pipeline at NeuMan scale.

This is the headline-benchmark run. The reference's published performance
claims (paper linked from /root/reference/README.md) are "~30 min
training" and "60 FPS rendering"; its release recipe is
cfg_files/release/neuman/hugs_human_scene.yaml — 14,998 steps of joint
human+scene training at NeuMan resolution (~960x540) starting from
110,210 human Gaussians (6,890 SMPL verts subdivided twice,
subdivide_smpl.py:126-134) plus the COLMAP scene cloud. This script runs
THAT recipe through hugs_tpu's actual trainer (train/trainer.py:
GaussianTrainer - train/validate/densify/ckpt, the parity surface of
hugs/trainer/gs_trainer.py:218-391) on one TPU chip and records
wall-clock + quality evidence.

Workload stand-in (no datasets ship in this environment): a synthetic
monocular-video scene built to NeuMan-lab statistics - an articulated
striped human (synthetic SMPL body, 6,912 verts = reference's 6,890;
subdivided x2 for the template like the release config) walking through
an orbit of 104 camera frames inside a textured room (bg sphere + floor
+ box obstacles ~ the COLMAP cloud + bg-sphere injection of
hugs/datasets/neuman.py:246-273), masks derived exactly like the
dataset's SAM masks would be. Train/val split: every 8th frame held out
(reference split rule neuman.py:47-59 holds out a sparse subset).

Deviations from the release yaml (each documented in the evidence JSON):
  - lpips_w: FLAGSHIP_LPIPS env (default 0). No pretrained VGG weights
    exist in this environment (zero egress), so LPIPS-as-loss would run
    on random features; the full-workload step time WITH patch-LPIPS
    compute is probed separately and recorded.
  - max_n_gaussians capped at the static capacities (131,072 human /
    131,072 scene) - fixed-capacity design; the reference caps are
    524,288 / 2,097,152 but its runs end far below the human cap.

Run (default TPU env; ~40-70 min wall):
    cd /root/repo && nohup timeout 6000 python \
        scripts/flagship_release_tpu.py > /tmp/flagship.log 2>&1 &
Probe (a few hundred steps, prints steps/s):
    FLAGSHIP_STEPS=200 ... same command
CPU smoke: FLAGSHIP_SMOKE=1 + local-CPU env.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SMOKE = bool(int(os.environ.get("FLAGSHIP_SMOKE", "0")))
W, H = (96, 64) if SMOKE else (960, 540)
F = 8 if SMOKE else 104
STEPS = int(os.environ.get("FLAGSHIP_STEPS", "10" if SMOKE else "14998"))
VPB = 4 if SMOKE else int(os.environ.get("FLAGSHIP_VPB", "460"))
# synthetic-SMPL verts per bone; 460 -> 11,040-vert body, x2 subdivision
# -> ~110k initial human Gaussians == the reference's 110,210
# (6,890-vert SMPL subdivided twice, BASELINE.md)
N_SUBDIV = 1 if SMOKE else 2
H_CAP = 512 if SMOKE else 131072
S_CAP = 512 if SMOKE else 131072
IBUDGET = (1 << 14) if SMOKE else int(
    os.environ.get("FLAGSHIP_IBUDGET", "393216"))  # start bucket; auto-grows
GT_BUDGET = (1 << 14) if SMOKE else (1 << 18)
N_SPHERE = 128 if SMOKE else 24000
N_FLOOR = 64 if SMOKE else 8000
N_BOX = 16 if SMOKE else 2000
LPIPS_W = float(os.environ.get("FLAGSHIP_LPIPS", "0"))
VAL_INTERVAL = 4 if SMOKE else 1000
# fresh per-run output dir by default: the trainer AUTO-RESUMES from the
# latest checkpoint in logdir_ckpt, so reusing a dir across differently-
# shaped runs (e.g. after a smoke run) must be explicit, not accidental
OUT = os.environ.get("FLAGSHIP_OUT",
                     time.strftime("/tmp/flagship_out_%m%d_%H%M%S"))


def gt_poses(f, n):
    """Walking-ish articulated cycle (same family as the r2 evidence
    runs): swinging arms/legs, slight torso turn; two full gait cycles
    over the sequence so held-out frames are interpolations."""
    t = 4.0 * np.pi * f / n
    pose = np.zeros(69, np.float32)
    pose[0 * 3 + 0] = 0.45 * np.sin(t)          # L hip
    pose[1 * 3 + 0] = -0.45 * np.sin(t)         # R hip
    pose[3 * 3 + 0] = 0.55 * max(0.0, np.sin(t))    # L knee
    pose[4 * 3 + 0] = 0.55 * max(0.0, -np.sin(t))   # R knee
    pose[15 * 3 + 2] = 0.7 * np.sin(t)          # L shoulder
    pose[16 * 3 + 2] = -0.7 * np.sin(t)         # R shoulder
    pose[17 * 3 + 1] = 0.45 * np.cos(t)         # L elbow
    pose[18 * 3 + 1] = -0.45 * np.cos(t)        # R elbow
    pose[8 * 3 + 1] = 0.25 * np.sin(2 * t)      # spine twist
    pose[11 * 3 + 0] = 0.1 * np.sin(t + 1.0)    # neck nod
    orient = np.array([0.0, 0.2 * np.sin(t * 0.5), 0.0], np.float32)
    return pose, orient


def scene_points(rng):
    """Textured room at NeuMan-lab point-cloud scale: bg sphere + floor
    disc + two box obstacles, all procedurally striped."""
    u = rng.normal(size=(N_SPHERE, 3))
    sph = 6.0 * u / np.linalg.norm(u, axis=1, keepdims=True)
    r = np.sqrt(rng.uniform(0.05, 1.0, N_FLOOR)) * 3.0
    th = rng.uniform(0, 2 * np.pi, N_FLOOR)
    floor = np.stack([r * np.cos(th), np.full(N_FLOOR, -1.25),
                      r * np.sin(th)], axis=1)
    boxes = []
    for cx, cz in ((1.6, 1.2), (-1.5, -1.0)):
        b = rng.uniform(-1, 1, (N_BOX, 3)) * [0.25, 0.45, 0.25]
        b[:, 1] += -0.8
        b[:, 0] += cx
        b[:, 2] += cz
        boxes.append(b)
    pts = np.concatenate([sph, floor] + boxes).astype(np.float32)
    col = np.stack([0.5 + 0.35 * np.sin(3.0 * pts[:, 0]),
                    0.5 + 0.35 * np.sin(2.0 * pts[:, 1] + 1.0),
                    0.5 + 0.35 * np.cos(2.5 * pts[:, 2] + 3.0)], axis=1)
    return pts, np.clip(col, 0.0, 1.0).astype(np.float32)


class SyntheticNeumanScale:
    """In-memory dataset with the NeumanDataset item contract
    (data/neuman.py per-frame dict; frames cached on device exactly like
    the reference caches to GPU, neuman.py:394-401)."""

    def __init__(self, frames, init_pcd, radius):
        self.frames = frames
        self.init_pcd = init_pcd
        self.radius = radius

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i):
        return self.frames[i]


def main():
    from hugs_tpu.cfg import load_config
    from hugs_tpu.models.smpl import synthetic_smpl, smpl_forward
    from hugs_tpu.ops.knn import mean_sq_dist_to_knn
    from hugs_tpu.render import render
    from hugs_tpu.train.trainer import GaussianTrainer
    from hugs_tpu.utils.image import save_png

    t_wall0 = time.time()
    rng = np.random.RandomState(0)
    smpl = synthetic_smpl(verts_per_bone=VPB)
    betas = jnp.zeros(10)
    print(f"smpl verts={smpl.n_verts}", flush=True)

    # ---- GT splat scene ----
    vt = np.asarray(smpl.v_template)
    hcol = np.stack([0.5 + 0.45 * np.sin(25.0 * vt[:, 1]),
                     0.5 + 0.45 * np.sin(20.0 * vt[:, 0] + 2.0),
                     0.5 + 0.45 * np.cos(18.0 * vt[:, 2] + 4.0)], axis=1)
    d2h = mean_sq_dist_to_knn(jnp.asarray(vt), k=3)
    h_scales = jnp.tile(jnp.sqrt(jnp.clip(d2h, 1e-8))[:, None] * 0.9,
                        (1, 3))
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
    bg = jnp.full(3, 0.2)

    from hugs_tpu.data.cameras import get_rotating_camera
    cams = get_rotating_camera(img_size=(H, W), fov=0.95, dist=3.0,
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
                      active_sh_degree=0, instance_budget=GT_BUDGET,
                      backend="pallas")["render"]
        hq = jnp.tile(idq, (out.vertices.shape[0], 1))
        hop = jnp.full(out.vertices.shape[0], 0.95)
        i0 = render(out.vertices, h_scales, hq, hop, h_shs, camera, W, H,
                    bg=jnp.zeros(3), active_sh_degree=0,
                    instance_budget=GT_BUDGET, backend="pallas")["render"]
        i1 = render(out.vertices, h_scales, hq, hop, h_shs, camera, W, H,
                    bg=jnp.ones(3), active_sh_degree=0,
                    instance_budget=GT_BUDGET, backend="pallas")["render"]
        mask = (jnp.clip((i1 - i0).mean(0), 0, 1) < 0.5).astype(jnp.float32)
        return full, mask

    frames = []
    for f in range(F):
        pose, orient = gt_poses(f, F)
        img, mask = render_gt(jnp.asarray(pose), jnp.asarray(orient),
                              cams[f]["camera"])
        m = np.asarray(mask)
        ys, xs = np.where(m > 0.5)
        bbox = (np.array([ys.min(), xs.min(), ys.max(), xs.max()],
                         np.int32) if ys.size
                else np.array([0, 0, H - 1, W - 1], np.int32))
        frames.append({
            "camera": cams[f]["camera"], "rgb": img, "mask": mask,
            "width": W, "height": H, "bbox": bbox,
            "betas": np.zeros(10, np.float32), "body_pose": pose,
            "global_orient": orient, "transl": np.zeros(3, np.float32),
            "smpl_scale": np.float32(1.0),
        })
    print(f"GT: {F} frames @ {W}x{H}, mask% "
          f"{np.mean([float(f['mask'].mean()) for f in frames]):.3f}, "
          f"t={time.time() - t_wall0:.0f}s", flush=True)

    val_idx = [i for i in range(F) if i % 8 == 4]
    train_idx = [i for i in range(F) if i % 8 != 4]
    # sparse "COLMAP" observation of the room: subsample + noise
    obs = rng.rand(spts.shape[0]) < 0.6
    init_pts = (spts[obs] + rng.normal(size=(obs.sum(), 3)).astype(
        np.float32) * 0.03)
    init_col = np.clip(scol[obs] + rng.normal(size=(obs.sum(), 3)).astype(
        np.float32) * 0.08, 0, 1)
    ds_train = SyntheticNeumanScale(
        [frames[i] for i in train_idx], (init_pts, init_col), radius=4.0)
    ds_val = SyntheticNeumanScale(
        [frames[i] for i in val_idx], (init_pts, init_col), radius=4.0)

    # ---- release config through the real trainer ----
    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "cfg_files", "neuman", "hugs_human_scene.yaml")
    cfg = load_config(cfg_path)
    cfg.train.num_steps = STEPS
    cfg.train.val_interval = VAL_INTERVAL
    cfg.train.save_ckpt_interval = 4 if SMOKE else 5000
    cfg.train.anim_interval = 0
    cfg.human.n_subdivision = N_SUBDIV
    cfg.human.loss.lpips_w = LPIPS_W
    cfg.human.max_n_gaussians = H_CAP
    cfg.scene.max_n_gaussians = S_CAP
    cfg.tpu.human_capacity = H_CAP
    cfg.tpu.scene_capacity = S_CAP
    cfg.tpu.instance_budget = IBUDGET
    cfg.tpu.render_backend = "pallas"
    cfg.human.init_steps = 100 if SMOKE else 7000
    cfg.logdir = OUT
    cfg.logdir_ckpt = os.path.join(OUT, "ckpt")
    for sub in ("", "train", "val", "ckpt", "anim"):
        os.makedirs(os.path.join(OUT, sub), exist_ok=True)

    t0 = time.time()
    trainer = GaussianTrainer(cfg, train_dataset=ds_train,
                              val_dataset=ds_val, smpl_model=smpl)
    if not int(os.environ.get("FLAGSHIP_FIXED_BUDGET", "0")):
        trainer._ibudget_fixed = False    # fixed start, auto-grow on
    setup_s = time.time() - t0
    n_h_init = int(jnp.sum(trainer.human.state.alive))
    print(f"trainer built (incl. {cfg.human.init_steps}-step init "
          f"distillation): {setup_s:.0f}s; human template {n_h_init} "
          f"init gaussians, capacity {H_CAP}", flush=True)

    t0 = time.time()
    trainer.train()
    train_s = time.time() - t0

    t0 = time.time()
    try:
        final = trainer.validate()
    except Exception as e:                     # relay flake: retry once
        print(f"final validate failed ({e}); retrying", flush=True)
        final = trainer.validate()
    val_s = time.time() - t0
    print("final metrics:", final, flush=True)

    # novel-pose strip: phases between training poses, held-out camera
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    strip = []
    for k in range(6):
        pose, orient = gt_poses(k + 0.5, 6)
        d = dict(frames[val_idx[0]])
        d["body_pose"], d["global_orient"] = pose, orient
        pkg = trainer.render_frame(d)
        strip.append(np.asarray(pkg["render"]))
    save_png(np.concatenate(strip, axis=2),
             os.path.join(ev, "flagship_anim_strip.png"))

    d = frames[val_idx[len(val_idx) // 2]]
    pkg = trainer.render_frame(d)
    save_png(np.asarray(pkg["render"]), os.path.join(ev, "flagship_fit.png"))
    save_png(np.asarray(d["rgb"]), os.path.join(ev, "flagship_gt.png"))

    n_h = int(jnp.sum(trainer.human.state.alive)) if trainer.human else 0
    n_s = int(jnp.sum(trainer.scene.gs.alive)) if trainer.scene else 0
    out = {
        "workload": f"RELEASE recipe (hugs_human_scene.yaml): {STEPS} "
                    f"joint steps @ {W}x{H}, human template "
                    f"{n_h_init} -> {n_h} gaussians "
                    f"(cap {H_CAP}), scene {init_pts.shape[0]} -> {n_s} "
                    f"(cap {S_CAP}), densify+prune+SH-ramp+budget-autogrow "
                    f"active, loss l1 {cfg.human.loss.l1_w} + ssim "
                    f"{cfg.human.loss.ssim_w} + lbs {cfg.human.loss.lbs_w} "
                    f"+ humansep {cfg.human.loss.humansep_w} + lpips "
                    f"{LPIPS_W}",
        "reference_headline": "paper claims ~30 min training (arXiv:"
                              "2311.17910); release yaml = 14998 steps",
        "train_wall_s": round(train_s, 1),
        "train_wall_min": round(train_s / 60, 1),
        "setup_s": round(setup_s, 1),
        "steps_per_s": round(STEPS / train_s, 2),
        "final_metrics": final,
        "eval_curve": trainer.eval_metrics,
        "device": jax.devices()[0].platform,
        "lpips_note": "lpips_w=0 unless FLAGSHIP_LPIPS set: no pretrained "
                      "VGG weights in this env (metrics report "
                      "hugs_lpips_uncalibrated)",
    }
    with open(os.path.join(ev, "flagship_release_tpu.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
