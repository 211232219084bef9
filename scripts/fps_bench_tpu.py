"""Inference FPS benchmark: animated avatar + scene rendering on one TPU
chip at NeuMan scale — the counterpart of the reference's "60 FPS
rendering" headline claim (paper linked from /root/reference/README.md;
the reference's fast path is forward_test with the canonical decode
cached, hugs_trimlp.py:240-394).

Workload per frame: resolve a NEW body pose (SMPL joint transforms +
LBS skinning of the human Gaussians via the cached canonical decode,
human_gs.human_forward(canon_out=...)), merge with the static scene set,
and run the full projection/binning/Pallas-blend forward at 960x540.
Counts: ~110k human + ~100k scene Gaussians (trained-model scale).

Timing: 20 frames chained inside ONE jitted fori_loop (each frame's pose
perturbed by a hair of the previous frame's pixels so steps cannot be
elided or overlapped), best of 5 blocks — the micro_loop methodology,
relay-dispatch-free (bench.py docstring).

Writes evidence/fps_bench_tpu.json. Run:
    cd /root/repo && nohup timeout 1700 python scripts/fps_bench_tpu.py \
        > /tmp/fps.log 2>&1 &
CPU smoke: FPS_SMOKE=1 + local-CPU env.
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

SMOKE = bool(int(os.environ.get("FPS_SMOKE", "0")))
W, H = (96, 64) if SMOKE else (960, 540)
VPB = 4 if SMOKE else 288
N_SUBDIV = 1 if SMOKE else 2
H_CAP = 512 if SMOKE else 131072
N_SCENE = 256 if SMOKE else 100_000
# static probe cap, NOT the serving budget: the probe right-sizes the
# bucket below this. Big enough that a heavy synthetic scene is not
# silently clipped (the r4 first run clamped 901k instances to a 459k
# budget — over half the fragments dropped = a dishonest number).
IBUDGET = (1 << 14) if SMOKE else (1 << 21)
FRAMES = 4 if SMOKE else 20
BLOCKS = 2 if SMOKE else 5
# FPS_CKPT=<flagship output dir>: benchmark the TRAINED avatar+scene
# (the honest counterpart of the paper's "60 FPS rendering" claim —
# inference renders a trained model, not a random cloud); restores the
# latest checkpoint through the eval-mode GaussianTrainer exactly like
# scripts/evaluate.py.
CKPT = os.environ.get("FPS_CKPT", "")


def load_trained(ckpt_dir):
    """Eval-mode trainer with flagship shapes; restore latest ckpt."""
    from hugs_tpu.cfg import load_config
    from hugs_tpu.train.trainer import GaussianTrainer

    cfg = load_config(os.path.join(
        os.path.dirname(__file__), "..", "cfg_files", "neuman",
        "hugs_human_scene.yaml"))
    cfg.eval = True
    cfg.human.n_subdivision = N_SUBDIV
    cfg.human.max_n_gaussians = H_CAP
    cfg.scene.max_n_gaussians = H_CAP
    cfg.tpu.human_capacity = H_CAP
    cfg.tpu.scene_capacity = H_CAP
    cfg.tpu.smpl_vpb = 4 if SMOKE else 460   # flagship synthetic body
    cfg.tpu.render_backend = "pallas"
    cfg.logdir = ckpt_dir
    cfg.logdir_ckpt = os.path.join(ckpt_dir, "ckpt")
    trainer = GaussianTrainer(cfg, None, None, None)
    if not trainer.load_latest_ckpt():
        raise SystemExit(f"no checkpoint restored from {ckpt_dir}")
    return trainer


def main():
    from hugs_tpu.models import human_gs as hgs
    from hugs_tpu.models import scene_gs as sgs
    from hugs_tpu.models.smpl import synthetic_smpl
    from hugs_tpu.models.subdivide import subdivide_smpl_model
    from hugs_tpu.render import render_human_scene
    from hugs_tpu.data.cameras import get_rotating_camera

    rng = np.random.RandomState(0)
    betas = jnp.zeros(10)
    if CKPT:
        trainer = load_trained(CKPT)
        params, state = trainer.human.params, trainer.human.state
        fixed, cfg = trainer.fixed, trainer.human_cfg
        n_human = int(jnp.sum(state.alive))
        # serving-time compaction: decode the canonical attrs once at
        # the training capacity, then right-size every per-Gaussian
        # array to the live population (the training capacity pads 42k
        # alive gaussians to 262k rows — projection/LBS/binning all pay
        # those rows per frame)
        canon_out = hgs.canon_forward(params, state, cfg)
        # fine-grained (2k/4k) buckets instead of pow2: projection, LBS
        # and binning pay every ROW per frame, and a pow2 bucket wastes
        # up to 2x rows (the r5 flagship: 37,689 scene gaussians in a
        # 65,536 bucket = 42% phantom rows)
        n_h = int(jnp.sum(state.alive))
        params, state, canon_out = hgs.compact_for_inference(
            params, state, canon_out, bucket=-(-max(n_h, 1) // 2048) * 2048)
        n_s = int(jnp.sum(trainer.scene.gs.alive))
        gs_c = sgs.compact(trainer.scene.gs,
                           bucket=-(-max(n_s, 1) // 4096) * 4096)
        s_out = sgs.scene_forward(gs_c)
        n_scene = int(jnp.sum(gs_c.alive))
        workload_tag = (f"TRAINED flagship ckpt ({CKPT}): {n_human} human"
                        f" (bucket {state.alive.shape[0]}) + {n_scene} "
                        f"scene gauss (bucket {gs_c.capacity})")
    else:
        smpl = synthetic_smpl(verts_per_bone=VPB)
        template = subdivide_smpl_model(smpl, smoothing=True,
                                        n_iter=N_SUBDIV)
        cfg = hgs.HumanGSConfig(use_deformer=True, disable_posedirs=True)
        key = jax.random.PRNGKey(0)
        params, state, fixed, _ = hgs.init_human_gs(
            key, cfg, smpl, template, betas, n_frames=1, capacity=H_CAP)
        n_human = int(jnp.sum(state.alive))

        pts = rng.uniform(-4, 4, (N_SCENE, 3)).astype(np.float32)
        pts /= np.maximum(
            np.linalg.norm(pts, axis=1, keepdims=True) / 4.0, 1.0)
        cols = rng.rand(N_SCENE, 3).astype(np.float32)
        gs = sgs.create_from_pcd(jnp.asarray(pts), jnp.asarray(cols),
                                 N_SCENE, max_sh_degree=3)
        s_out = sgs.scene_forward(gs)     # static scene: computed once
        n_scene = N_SCENE
        workload_tag = (f"synthetic stress cloud: {n_human} human + "
                        f"{n_scene} scene gauss")

    cam = get_rotating_camera(img_size=(H, W), fov=0.95, dist=3.0,
                              nframes=2)[0]["camera"]
    bg = jnp.zeros(3)

    # the reference's forward_test: canonical decode cached once
    if not CKPT:
        canon_out = hgs.canon_forward(params, state, cfg)

    base_pose = jnp.zeros(69)

    def frame_full(pose, budget):
        h_out = hgs.human_forward(
            params, state, fixed, cfg, global_orient=jnp.zeros(3),
            body_pose=pose, betas=betas, transl=jnp.zeros(3),
            smpl_scale=jnp.float32(1.0), canon_out=canon_out,
            compute_gt_lbs=False)
        return render_human_scene(
            {"camera": cam, "width": W, "height": H}, h_out, s_out,
            bg_color=bg, render_mode="human_scene", backend="pallas",
            instance_budget=budget)

    # Right-size the instance budget with a REHEARSAL PASS: the sort,
    # the binning payload gather/scatter, and the instance pack all pay
    # the STATIC budget (index-bound, ~7ns/slot), so a serving
    # deployment dry-runs its animation once, records the max slot
    # demand, and sizes the arena to it. The block's pose trajectory is
    # deterministic (the 1e-30 pixel term is numerically invisible), so
    # probing every frame's demand at the big static cap gives the
    # exact max; 1.15x margin + 8192-granularity buckets then waste
    # ~15% instead of the up-to-2x of pow2 sizing (the r4 first cut:
    # one base-pose probe x1.3 into 32768 buckets; trained-avatar
    # serving still carried 262144 slots for ~155k of demand).
    probe = jax.jit(lambda p: frame_full(p, IBUDGET)["n_slots"])
    pose, demands = base_pose, []
    for i in range(FRAMES):
        demands.append(int(probe(pose)))
        pose = pose + 0.01 * jnp.sin(
            jnp.float32(i) + jnp.arange(69, dtype=jnp.float32))
    n_inst = max(demands)
    budget = max(1 << 14, -(-(n_inst * 23 // 20) // 8192) * 8192)
    budget = min(budget, IBUDGET)
    print(f"rehearsal: max {n_inst} slots over {FRAMES} frames "
          f"(min {min(demands)}) -> budget {budget} "
          f"(static cap {IBUDGET})", flush=True)

    def frame(pose):
        return frame_full(pose, budget)["render"]

    @jax.jit
    def block(p0):
        def body(i, p):
            img = frame(p)
            # next pose depends on this frame's pixels: no elision
            return p + 1e-30 * img.mean() + 0.01 * jnp.sin(
                jnp.float32(i) + jnp.arange(69, dtype=jnp.float32))
        return jax.lax.fori_loop(0, FRAMES, body, p0)

    t0 = time.time()
    jax.block_until_ready(block(base_pose))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(BLOCKS):
        t0 = time.time()
        jax.block_until_ready(block(base_pose))
        best = min(best, time.time() - t0)
    ms = best / FRAMES * 1e3
    fps = 1e3 / ms

    # also time the full (non-cached) forward: triplane+decoders per frame
    @jax.jit
    def block_full(p0):
        def body(i, p):
            h_out = hgs.human_forward(
                params, state, fixed, cfg, global_orient=jnp.zeros(3),
                body_pose=p, betas=betas, transl=jnp.zeros(3),
                smpl_scale=jnp.float32(1.0), compute_gt_lbs=False)
            pkg = render_human_scene(
                {"camera": cam, "width": W, "height": H}, h_out, s_out,
                bg_color=bg, render_mode="human_scene", backend="pallas",
                instance_budget=budget)
            img = pkg["render"]
            return p + 1e-30 * img.mean() + 0.01 * jnp.sin(
                jnp.float32(i) + jnp.arange(69, dtype=jnp.float32))
        return jax.lax.fori_loop(0, FRAMES, body, p0)

    jax.block_until_ready(block_full(base_pose))
    best_f = float("inf")
    for _ in range(BLOCKS):
        t0 = time.time()
        jax.block_until_ready(block_full(base_pose))
        best_f = min(best_f, time.time() - t0)
    ms_f = best_f / FRAMES * 1e3

    out = {
        "workload": f"animated human (LBS per frame) + static scene "
                    f"[{workload_tag}], {W}x{H}, pallas forward, "
                    f"canonical decode cached (reference forward_test "
                    f"path)",
        "ms_per_frame": round(ms, 2),
        "fps": round(fps, 1),
        "ms_per_frame_full_forward": round(ms_f, 2),
        "fps_full_forward": round(1e3 / ms_f, 1),
        "reference_headline": "paper claims 60 FPS rendering "
                              "(arXiv:2311.17910)",
        "vs_60fps": round(fps / 60.0, 2),
        "n_slots": n_inst,
        "instance_budget": budget,
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].platform,
        "scale_out_note": "single-chip number; band(tile)-sharded "
                          "rendering (parallel/shard.py::render_tile_"
                          "sharded, == single-device to 1e-5) moves only "
                          "one ~6 MB image all_gather per frame over ICI "
                          "(~0.1 ms at 50 GB/s), so FPS scales "
                          "near-linearly with chips in a slice; no "
                          "multi-chip hardware reachable here to "
                          "measure (SCALING.md)",
    }
    # smoke runs must never clobber the on-chip evidence artifacts
    ev = "/tmp" if SMOKE else os.path.join(
        os.path.dirname(__file__), "..", "evidence")
    name = "fps_trained_tpu.json" if CKPT else "fps_bench_tpu.json"
    with open(os.path.join(ev, name), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
