"""Training orchestration: the GaussianTrainer equivalent.

Host-side loop around the jitted step functions, mirroring the reference
trainer's behavior (hugs/trainer/gs_trainer.py:70-747): dataset setup,
model construction (+init distillation), the train loop with
per-interval densification / opacity reset / SH ramp / checkpoint /
validation / animation, and the eval metrics (PSNR/SSIM/LPIPS full-image
and human-bbox-crop).

Differences by design:
  - all per-step work is inside jitted functions; the host only sequences
    them and handles I/O;
  - checkpoints are orbax-saved pytrees (+ 3DGS PLY export for ecosystem
    interop);
  - datasets are pre-stacked into device arrays once (the reference
    caches to GPU the same way, neuman.py:394-401).
"""
from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from hugs_tpu.cfg import Config
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.models import human_gs as hgs
from hugs_tpu.models.smpl import load_smpl, synthetic_smpl
from hugs_tpu.models.subdivide import subdivide_smpl_model
from hugs_tpu.render import render_human_scene
from hugs_tpu.losses import HumanSceneLoss, LPIPS, psnr, ssim, ssim_masked

from hugs_tpu.train.scene_step import (
    init_scene_train_state, scene_train_step,
    scene_densify_step, make_scene_lrs)
from hugs_tpu.train.human_step import (
    init_human_train_state, human_train_step,
    human_densify_step, make_human_lrs, distill_init)
from hugs_tpu.train.joint_step import JointTrainState, joint_train_step
from hugs_tpu.train import checkpoint as ckpt_io
from hugs_tpu.utils.image import save_image_grid, save_png, create_video


def _budget_bucket(needed: int) -> int:
    """Round a required instance count up to the next budget bucket.

    Buckets are multiples of 32768 (1.25x headroom over `needed`), so a
    growing Gaussian population triggers only O(log) re-jits while wasting
    far less than power-of-two sizing (binning/pack cost scales with the
    static budget)."""
    step = 32768
    return max(1 << 16, -(-(needed * 5 // 4) // step) * step)


class GaussianTrainer:
    def __init__(self, cfg: Config, train_dataset=None, val_dataset=None,
                 anim_dataset=None, smpl_model=None):
        self.cfg = cfg
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.anim_dataset = anim_dataset
        self.eval_metrics: dict[str, Any] = {}
        self.rng = np.random.RandomState(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)
        self._crop_metric_cache: dict = {}

        self.bg_color = jnp.ones(3) if cfg.bg_color == "white" \
            else jnp.zeros(3)

        lpips_path = cfg.tpu.lpips_weights or None
        self.lpips = LPIPS.create(lpips_path)

        # ---- human model ----
        self.human = None
        self.human_cfg = None
        self.fixed = None
        self._h_cap = 0
        self._s_cap = 0
        if cfg.mode in ("human", "human_scene"):
            smpl = smpl_model
            if smpl is None:
                smpl_dir = os.path.join(cfg.dataset_path or "data", "smpl")
                smpl = (load_smpl(smpl_dir) if os.path.exists(smpl_dir)
                        else synthetic_smpl(verts_per_bone=int(
                            cfg.tpu.get("smpl_vpb", 32) or 32)))
            template = smpl
            if cfg.human.n_subdivision > 0:
                template = subdivide_smpl_model(
                    smpl, smoothing=True, n_iter=cfg.human.n_subdivision)
            self.human_cfg = hgs.HumanGSConfig(
                sh_degree=cfg.human.sh_degree,
                triplane_res=cfg.human.triplane_res,
                use_deformer=cfg.human.use_deformer,
                disable_posedirs=cfg.human.disable_posedirs,
                use_surface=cfg.human.use_surface,
                init_2d=cfg.human.init_2d,
                rotate_sh=cfg.human.rotate_sh,
                isotropic=cfg.human.isotropic,
                init_scale_multiplier=cfg.human.init_scale_multiplier)
            ds = train_dataset or val_dataset
            n_frames = len(ds) if ds else 1
            betas = (jnp.asarray(ds[0]["betas"]) if ds else jnp.zeros(10))
            cap = cfg.tpu.human_capacity or int(cfg.human.max_n_gaussians)
            cap = max(cap, template.n_verts)
            self._h_cap = cap
            init_pose = init_orient = init_transl = None
            if train_dataset is not None:
                init_pose = jnp.stack(
                    [jnp.asarray(d["body_pose"]) for d in train_dataset])
                init_orient = jnp.stack(
                    [jnp.asarray(d["global_orient"]) for d in train_dataset])
                init_transl = jnp.stack(
                    [jnp.asarray(d["transl"]) for d in train_dataset])
            self.key, k = jax.random.split(self.key)
            params, state, fixed, init_values = hgs.init_human_gs(
                k, self.human_cfg, smpl, template, betas, n_frames,
                capacity=cap, init_body_pose=init_pose,
                init_global_orient=init_orient, init_transl=init_transl)
            self.fixed = fixed
            self.init_values = init_values
            if not cfg.eval and cfg.human.run_init:
                params = distill_init(params, state, init_values,
                                      self.human_cfg,
                                      num_steps=cfg.human.get(
                                          "init_steps", 7000))
            self.human = init_human_train_state(params, state)
            self.h_static_lrs, self.h_xyz_sched = make_human_lrs(
                cfg.human.lr, optim_pose=cfg.human.optim_pose,
                optim_betas=cfg.human.optim_betas,
                optim_trans=cfg.human.optim_trans)

        # ---- scene model ----
        self.scene = None
        if cfg.mode in ("scene", "human_scene"):
            pcd_src = train_dataset if train_dataset is not None \
                else (val_dataset if val_dataset is not None
                      and hasattr(val_dataset, "init_pcd") else None)
            if pcd_src is not None:
                pts, cols = pcd_src.init_pcd
                self.scene_extent = pcd_src.radius
            else:
                # datasetless construction (tests): tiny placeholder —
                # it must not inflate the capacity past the config,
                # which would make checkpoint restore refuse
                pts = np.random.RandomState(0).uniform(
                    -3, 3, (8, 3)).astype(np.float32) + [0, 0, 4]
                cols = np.full((8, 3), 0.5, np.float32)
                self.scene_extent = 4.0
            cap = cfg.tpu.scene_capacity or int(cfg.scene.max_n_gaussians)
            cap = max(cap, pts.shape[0])
            self._s_cap = cap
            gs = sgs.create_from_pcd(pts, cols, cap,
                                     max_sh_degree=cfg.scene.sh_degree)
            self.scene = init_scene_train_state(gs)
            self.s_static_lrs, self.s_xyz_sched = make_scene_lrs(
                cfg.scene.lr, self.scene_extent)

        # Tile-instance budget: fixed from config, or auto-sized (grown on
        # demand — see _check_budget; reference densify caps: cfg/config.py
        # max_n_gaussians semantics).
        self._ibudget = int(cfg.tpu.instance_budget) or _budget_bucket(
            4 * (self._h_cap + self._s_cap))
        self._ibudget_fixed = bool(int(cfg.tpu.instance_budget))

        # loss config (lpips passed separately at call time)
        l = cfg.human.loss if cfg.mode != "scene" else cfg.scene.loss
        self.loss_fn = HumanSceneLoss(
            l_ssim_w=l.ssim_w, l_l1_w=l.l1_w,
            l_lpips_w=l.get("lpips_w", 0.0),
            l_lbs_w=l.get("lbs_w", 0.0),
            l_humansep_w=l.get("humansep_w", 0.0),
            num_patches=l.get("num_patches", 4),
            patch_size=l.get("patch_size", 128),
            use_patches=bool(l.get("use_patches", True)))

        # try auto-resume
        if cfg.logdir_ckpt and os.path.isdir(cfg.logdir_ckpt):
            self.load_latest_ckpt()

    # ------------------------------------------------------------- utils

    def _get_gauss_scene_step(self, W, H, gshard):
        """Cached Gaussian-sharded scene train step (scene mode with
        cfg.tpu.gauss_shard > 0). Shards the train state to the owner
        chips on first build."""
        key = ("gstep", W, H, gshard, self._ibudget)
        if getattr(self, "_gauss_step_key", None) != key:
            from hugs_tpu.parallel.gauss_train import (
                make_gauss_scene_train_step, shard_scene_state)
            cfg, t = self.cfg, self.cfg.tpu
            mesh = self._get_gauss_mesh(gshard)
            self.scene = shard_scene_state(self.scene, mesh)
            self._gauss_step = make_gauss_scene_train_step(
                mesh, width=W, height=H,
                l1_w=cfg.scene.loss.l1_w, ssim_w=cfg.scene.loss.ssim_w,
                local_budget=max(self._ibudget // gshard, 1 << 12),
                frag_cap=int(t.get("gauss_frag_cap", 0) or 0) or None,
                tile_cap=int(t.tile_cap), backend=t.render_backend)
            self._gauss_step_key = key
        return self._gauss_step

    def _get_gauss_mesh(self, n):
        """1-D ('gauss',) mesh over the first n devices, built once."""
        if getattr(self, "_gauss_mesh", None) is None \
                or self._gauss_mesh.shape["gauss"] != n:
            from jax.sharding import Mesh
            devs = jax.devices()
            if len(devs) < n:
                raise ValueError(
                    f"tpu.gauss_shard={n} but only {len(devs)} devices")
            self._gauss_mesh = Mesh(np.array(devs[:n]), ("gauss",))
        return self._gauss_mesh

    def _eval_render_kw(self, budget=None):
        """Render kwargs for EVAL closures (render_frame/_val_frame):
        training kwargs + optional Gaussian-sharded serving routing
        (cfg.tpu.gauss_shard devices; VERDICT r4 item 4 — scenes too
        large to replicate per chip). Training steps never see these."""
        rkw = dict(self._render_kw())
        if budget is not None:
            rkw["instance_budget"] = budget
        gshard = int(self.cfg.tpu.get("gauss_shard", 0) or 0)
        if gshard:
            rkw.update(
                gauss_mesh=self._get_gauss_mesh(gshard),
                gauss_frag_cap=int(self.cfg.tpu.get(
                    "gauss_frag_cap", 0) or 0) or None)
        return rkw

    def _render_kw(self):
        t = self.cfg.tpu
        return dict(backend=t.render_backend,
                    instance_budget=self._ibudget,
                    tile_cap=int(t.tile_cap))

    def _check_budget(self, aux, ni=None, overflowed=None,
                      ninst=None) -> bool:
        """Grow the instance budget from the measured SLOT demand
        (instances + tile-alignment padding, bins.n_slots — alignment
        waste counts against the budget since tiles.bin_gaussians sized
        its array to the budget itself).

        Returns True when the step OVERFLOWED the budget (instances were
        dropped) — the caller re-runs the step at the grown budget instead
        of committing a degraded update (VERDICT r1 item 2; reference
        never drops: gs_renderer duplicates into an exact-size buffer).
        Also grows PROACTIVELY at 3/4 occupancy so densification growth
        re-jits before ever overflowing.

        ni/overflowed may be passed pre-fetched: each scalar device read
        costs a full host<->device round trip (~80 ms/step through the
        TPU-tunnel relay of this environment — measured to dominate the
        step), so the train loop batches them into one device_get and
        only on SYNC steps (every 10th + around densification
        boundaries, the only places the count jumps >25% at once)."""
        if self._ibudget_fixed or not (
                "n_slots" in aux or "n_instances" in aux):
            return False
        if ni is None:
            ni = int(aux.get("n_slots", aux.get("n_instances", 0)))
        if overflowed is None:
            overflowed = bool(aux.get("overflowed", False))
        if overflowed or ni * 4 >= self._ibudget * 3:
            # Headroom scales the INSTANCE part only: alignment waste is
            # ~ALIGN/2 per non-empty tile — a function of the (fixed)
            # tile grid, not of densification growth — so multiplying it
            # by the 1.5x/1.25x margins would permanently oversize the
            # buckets (every slot costs ~7ns/step in the pack). ninst
            # arrives pre-fetched with ni (one batched device_get).
            if ninst is None:
                ninst = int(aux.get("n_instances", ni)) \
                    if "n_instances" in aux else ni
            waste = max(ni - ninst, 0)
            new = _budget_bucket(
                max(ninst * 3 // 2 + waste, self._ibudget))
            if new > self._ibudget:
                print(f"instance budget: {self._ibudget} -> {new} "
                      f"(n_slots={ni}"
                      f"{', overflowed — retrying step' if overflowed else ''})")
                self._ibudget = new
        return overflowed

    def _is_sync_step(self, t_iter: int) -> bool:
        """Steps whose aux scalars are worth a device round trip: every
        10th, plus the step right after either model's densify/prune or
        opacity reset fired (the only discontinuities in instance
        count)."""
        if t_iter % 10 == 0:
            return True
        cfg = self.cfg
        for prev in (t_iter - 1, t_iter):
            its = prev + 1
            if self.human is not None \
                    and its <= cfg.human.densify_until_iter \
                    and its % cfg.human.densification_interval == 0:
                return True
            if self.scene is not None:
                it = (prev - max(cfg.scene.opt_start_iter, 0)) + 1
                if it <= cfg.scene.densify_until_iter and (
                        it % cfg.scene.densification_interval == 0
                        or it % cfg.scene.opacity_reset_interval == 0):
                    return True
        return False

    def _frame(self, data):
        return (data["camera"], jnp.asarray(data["rgb"]),
                jnp.asarray(data["mask"]), data["width"], data["height"])

    # ------------------------------------------------------------- train

    def train(self):
        cfg = self.cfg
        if int(cfg.train.get("batch_size", 1) or 1) > 1:
            return self._train_batched()
        n = len(self.train_dataset)
        order = self.rng.permutation(n)
        pos = 0
        log = []
        t_start = time.time()
        for t_iter in range(cfg.train.num_steps + 1):
            if pos >= n:
                order = self.rng.permutation(n)
                pos = 0
            idx = int(order[pos])
            pos += 1
            data = self.train_dataset[idx]
            camera, gt, mask, W, H = self._frame(data)
            self.key, k_step, k_bg = jax.random.split(self.key, 3)
            bg = jax.random.uniform(k_bg, (3,))
            # scalar reads (loss/n_instances/overflowed) cost a full
            # relay round trip (~80 ms measured) — fetch them in ONE
            # device_get and only on sync steps (_is_sync_step); all
            # other steps run free of host-device synchronization.
            sync = self._is_sync_step(t_iter)
            vals = None
            for _attempt in range(3):
                snap = (self.human, self.scene, self.key)
                aux = self._train_step(t_iter, idx, data, camera, gt,
                                       mask, W, H, bg, k_step)
                if not sync:
                    break
                vals = jax.device_get((aux["loss"],
                                       aux.get("n_slots",
                                               aux.get("n_instances", 0)),
                                       aux.get("overflowed", False),
                                       aux.get("n_instances", 0)))
                if not self._check_budget(aux, ni=int(vals[1]),
                                          overflowed=bool(vals[2]),
                                          ninst=(int(vals[3])
                                                 if "n_instances" in aux
                                                 else None)):
                    break
                # budget overflow: discard the degraded update and re-run
                # the step at the grown budget (re-jit, one-off cost)
                self.human, self.scene, self.key = snap
            else:
                print(f"WARNING: tile-instance budget overflow persists "
                      f"at iter {t_iter} (budget={self._ibudget})")

            if t_iter % 10 == 0 and vals is not None:
                rec = {"iter": t_iter,
                       "loss": float(vals[0]),
                       "elapsed_s": time.time() - t_start}
                log.append(rec)
                self._log_jsonl(rec)
                if bool(vals[2]) and self._ibudget_fixed:
                    print(f"WARNING: tile-instance budget overflow at "
                          f"iter {t_iter} — raise tpu.instance_budget "
                          f"(dropped Gaussian instances degrade quality)")
            self._periodic(t_iter, aux, data)
        self._finish_progress_video()
        # final checkpoint (reference gs_trainer saves at train end; the
        # interval ckpts alone miss the last num_steps % interval steps —
        # the r4 flagship FPS bench would have served a 10k-step model)
        if cfg.logdir and cfg.train.num_steps % \
                cfg.train.save_ckpt_interval != 0:
            self.save_ckpt(cfg.train.num_steps)
        return log

    def _train_step(self, t_iter, idx, data, camera, gt, mask, W, H, bg,
                    key):
        cfg = self.cfg
        mode = cfg.mode
        scene_on = self.scene is not None and \
            t_iter >= cfg.scene.opt_start_iter
        if mode == "human_scene" and not scene_on:
            mode = "human"

        if mode == "scene":
            gshard = int(cfg.tpu.get("gauss_shard", 0) or 0)
            if gshard:
                # Gaussian-sharded scene training (parallel/gauss_train):
                # the capacity's rows are sharded over gshard chips with
                # one fragment all_to_all per step — for scene clouds
                # too large to replicate. Budget auto-grow doesn't apply
                # (per-chip local budget = instance_budget / gshard;
                # overflow is surfaced in aux and warned on sync steps).
                step = self._get_gauss_scene_step(W, H, gshard)
                self.scene, aux = step(
                    self.scene, camera, gt, bg,
                    jnp.float32(self.s_xyz_sched(t_iter)),
                    self.s_static_lrs)
            else:
                self.scene, aux = scene_train_step(
                    self.scene, camera, gt, bg,
                    jnp.float32(self.s_xyz_sched(t_iter)),
                    self.s_static_lrs,
                    width=W, height=H,
                    l1_w=cfg.scene.loss.l1_w,
                    ssim_w=cfg.scene.loss.ssim_w,
                    **self._render_kw())
            self._maybe_densify_scene(t_iter)
        elif mode == "human":
            self.human, aux = human_train_step(
                self.human, self.fixed, camera, gt, mask, bg,
                jnp.asarray(data["smpl_scale"], jnp.float32).reshape(()),
                jnp.int32(idx), key,
                jnp.float32(self.h_xyz_sched(t_iter)), self.h_static_lrs,
                lpips=(self.lpips if self.loss_fn.l_lpips_w > 0 else None),
                cfg=self.human_cfg, loss_fn=self.loss_fn,
                width=W, height=H, **self._render_kw())
            self._maybe_densify_human(t_iter, aux)
        else:  # human_scene
            jstate = JointTrainState(human=self.human, scene=self.scene)
            self.key, k_hbg = jax.random.split(self.key)
            human_bg = jax.random.uniform(k_hbg, (3,))
            jstate, aux = joint_train_step(
                jstate, self.fixed, camera, gt, mask, bg, human_bg,
                jnp.asarray(data["smpl_scale"], jnp.float32).reshape(()),
                jnp.int32(idx), key,
                jnp.float32(self.h_xyz_sched(t_iter)), self.h_static_lrs,
                jnp.float32(self.s_xyz_sched(t_iter)), self.s_static_lrs,
                lpips=(self.lpips if self.loss_fn.l_lpips_w > 0 else None),
                cfg=self.human_cfg, loss_fn=self.loss_fn, width=W, height=H,
                render_human_separate=self.loss_fn.l_humansep_w > 0,
                optim_scene=cfg.train.optim_scene, **self._render_kw())
            self.human, self.scene = jstate.human, jstate.scene
            self._maybe_densify_human(t_iter, aux)
            self._maybe_densify_scene(t_iter)
        return aux

    # -------------------------------------------------- batched training

    def _get_dp_step(self, W, H, n_data, mode="human_scene"):
        """Build (and cache) the dp x tile sharded joint step used for
        train.batch_size > 1: frames are the 'data' axis, spread over
        n_data devices with the remainder vmapped per chip. mode='human'
        is the staged-start phase before scene.opt_start_iter (scene
        neither rendered nor optimized, reference gs_trainer.py:248-252);
        both phases share signature/state so the switch at
        opt_start_iter is just a different cached closure."""
        key = (W, H, n_data, self._ibudget, mode)
        if getattr(self, "_dp_cache_key", None) != key:
            from jax.sharding import Mesh
            from hugs_tpu.parallel.train_dp_tile import \
                make_dp_tile_train_step
            devs = np.array(jax.devices()[:n_data]).reshape(n_data, 1)
            mesh = Mesh(devs, ("data", "tile"))
            t = self.cfg.tpu
            self._dp_step = make_dp_tile_train_step(
                mesh, self.fixed, self.human_cfg, width=W, height=H,
                loss_fn=self.loss_fn,
                lpips=(self.lpips if self.loss_fn.l_lpips_w > 0 else None),
                tile_cap=int(t.tile_cap), instance_budget=self._ibudget,
                backend=t.render_backend,
                optim_scene=(self.cfg.train.optim_scene
                             and mode == "human_scene"),
                mode=mode)
            self._dp_cache_key = key
        return self._dp_step

    def _train_batched(self):
        """Train with batch_size frames per step through the dp x tile
        sharded joint step (the batch is the 'data' mesh axis; BASELINE
        config 5 / VERDICT r1 item 6). Requires human_scene mode."""
        cfg = self.cfg
        bsz = int(cfg.train.batch_size)
        if cfg.mode != "human_scene" or self.human is None \
                or self.scene is None:
            raise ValueError(
                "train.batch_size > 1 runs the joint dp x tile sharded "
                "step and needs mode='human_scene' (got mode="
                f"'{cfg.mode}')")
        opt_start = max(int(cfg.scene.opt_start_iter), 0)
        # largest divisor of the batch that fits the local device count
        n_dev = len(jax.devices())
        n_data = max(d for d in range(1, min(bsz, n_dev) + 1)
                     if bsz % d == 0)
        n = len(self.train_dataset)
        order = self.rng.permutation(n)
        pos = 0
        log = []
        t_start = time.time()
        for t_iter in range(cfg.train.num_steps + 1):
            idxs = []
            for _ in range(bsz):
                if pos >= n:
                    order = self.rng.permutation(n)
                    pos = 0
                idxs.append(int(order[pos]))
                pos += 1
            datas = [self.train_dataset[i] for i in idxs]
            W, H = datas[0]["width"], datas[0]["height"]
            cams = jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[d["camera"] for d in datas])
            gts = jnp.stack([jnp.asarray(d["rgb"]) for d in datas])
            masks = jnp.stack([jnp.asarray(d["mask"]) for d in datas])
            scales = jnp.stack([jnp.asarray(
                d.get("smpl_scale", 1.0), jnp.float32).reshape(())
                for d in datas])
            didx = jnp.asarray(idxs, jnp.int32)
            self.key, k_step, k_bg, k_hbg = jax.random.split(self.key, 4)
            bgs = jax.random.uniform(k_bg, (bsz, 3))
            hbgs = jax.random.uniform(k_hbg, (bsz, 3))
            keys = jax.random.split(k_step, bsz)
            h_lr = jnp.float32(self.h_xyz_sched(t_iter))
            s_lr = jnp.float32(self.s_xyz_sched(t_iter))
            sync = self._is_sync_step(t_iter)
            vals = None
            scene_on = t_iter >= opt_start
            for _attempt in range(3):
                snap = (self.human, self.scene, self.key)
                step = self._get_dp_step(
                    W, H, n_data,
                    mode="human_scene" if scene_on else "human")
                jstate, aux = step(
                    JointTrainState(human=self.human, scene=self.scene),
                    cams, gts, masks, bgs, hbgs, scales, didx, keys,
                    h_lr, self.h_static_lrs, s_lr, self.s_static_lrs)
                self.human, self.scene = jstate.human, jstate.scene
                if not sync:
                    break
                vals = jax.device_get((aux["loss"],
                                       aux.get("n_slots",
                                               aux.get("n_instances", 0)),
                                       aux.get("overflowed", False),
                                       aux.get("n_instances", 0)))
                if not self._check_budget(aux, ni=int(vals[1]),
                                          overflowed=bool(vals[2]),
                                          ninst=(int(vals[3])
                                                 if "n_instances" in aux
                                                 else None)):
                    break
                self.human, self.scene, self.key = snap
            else:
                print(f"WARNING: tile-instance budget overflow persists "
                      f"at iter {t_iter} (budget={self._ibudget})")
            self._maybe_densify_human(t_iter, aux)
            if scene_on:
                self._maybe_densify_scene(t_iter)
            if t_iter % 10 == 0 and vals is not None:
                rec = {"iter": t_iter, "loss": float(vals[0]),
                       "elapsed_s": time.time() - t_start}
                log.append(rec)
                self._log_jsonl(rec)
            self._periodic(t_iter, aux, datas[0])
        self._finish_progress_video()
        return log


    def _save_progress_frame(self, t_iter, nframes=2, img_size=128):
        """One labeled canonical-view strip into logdir/train_progress/
        (reference render_canonical(..., is_train_progress=True),
        gs_trainer.py:588-684 progress branch)."""
        from hugs_tpu.data.cameras import get_rotating_camera, \
            get_smpl_static_params
        cams = get_rotating_camera(img_size=img_size, dist=5.0,
                                   nframes=nframes)
        sp = get_smpl_static_params(self.human.params.betas,
                                    self.cfg.human.canon_pose_type)
        frames = [np.asarray(
            self.render_frame(dict(sp, **cp), render_mode="human")["render"])
            for cp in cams]
        save_image_grid(
            frames, f"{self.cfg.logdir}/train_progress/{t_iter:06d}.png")

    def _finish_progress_video(self):
        """train_progress frames -> one video, then drop the frames
        (reference gs_trainer.py:388-391)."""
        cfg = self.cfg
        if not (cfg.logdir and cfg.train.save_progress_images):
            return
        pdir = os.path.join(cfg.logdir, "train_progress")
        if not os.path.isdir(pdir):
            return
        seq = cfg.dataset.get("seq", "")
        seq = seq if isinstance(seq, str) else "-".join(map(str, seq))
        create_video(pdir, os.path.join(
            cfg.logdir, f"train_{cfg.dataset.name}_{seq}.mp4"), fps=10)
        shutil.rmtree(pdir)

    def _log_jsonl(self, rec: dict):
        """Append one structured metrics record to logdir/metrics.jsonl
        (crash-safe streaming observability; SURVEY §5 'structured jsonl
        metrics' — the reference only console-logs via loguru/tqdm)."""
        if not self.cfg.logdir:
            return
        with open(os.path.join(self.cfg.logdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _maybe_densify_scene(self, t_iter):
        cfg = self.cfg
        it = (t_iter - max(cfg.scene.opt_start_iter, 0)) + 1
        if self.scene is None or it > cfg.scene.densify_until_iter:
            return
        if it > cfg.scene.densify_from_iter \
                and it % cfg.scene.densification_interval == 0:
            size_thresh = 20.0 if it > cfg.scene.opacity_reset_interval \
                else None
            self.key, k = jax.random.split(self.key)
            self.scene, _ = scene_densify_step(
                self.scene, k, float(self.scene_extent),
                grad_threshold=cfg.scene.densify_grad_threshold,
                min_opacity=cfg.scene.prune_min_opacity,
                max_screen_size=size_thresh,
                percent_dense=cfg.scene.percent_dense,
                max_n_gaussians=int(cfg.scene.max_n_gaussians))
        is_white = float(self.bg_color.sum()) == 3.0
        if it % cfg.scene.opacity_reset_interval == 0 or \
                (is_white and it == cfg.scene.densify_from_iter):
            self.key, k = jax.random.split(self.key)
            self.scene, _ = scene_densify_step(
                self.scene, k, float(self.scene_extent),
                grad_threshold=np.inf, min_opacity=0.0,
                do_reset_opacity=True)

    def _maybe_densify_human(self, t_iter, aux):
        cfg = self.cfg
        it = t_iter + 1
        if self.human is None or it > cfg.human.densify_until_iter:
            return
        if it > cfg.human.densify_from_iter \
                and it % cfg.human.densification_interval == 0:
            out = {"opacity": aux["opacity"],
                   "scales_canon": aux["scales_canon"],
                   "rotmat_canon": aux["rotmat_canon"]}
            self.key, k = jax.random.split(self.key)
            self.human, _ = human_densify_step(
                self.human, out, k, float(cfg.human.densify_extent),
                grad_threshold=cfg.human.densify_grad_threshold,
                min_opacity=cfg.human.prune_min_opacity,
                max_screen_size=20.0,
                percent_dense=cfg.human.lr.percent_dense,
                max_n_gaussians=int(cfg.human.max_n_gaussians))

    def _periodic(self, t_iter, aux, data=None):
        cfg = self.cfg
        if t_iter % 1000 == 0 and t_iter > 0:
            if self.human is not None:
                self.human = self.human._replace(state=hgs.one_up_sh_degree(
                    self.human.state, cfg.human.sh_degree))
            if self.scene is not None:
                self.scene = self.scene._replace(gs=sgs.one_up_sh_degree(
                    self.scene.gs, cfg.scene.sh_degree))
        if cfg.logdir:
            if t_iter > 0 and t_iter % 1000 == 0 and data is not None:
                # train-view gt|pred comparison dump (reference
                # gs_trainer.py:307-314)
                pkg = self.render_frame(data)
                save_image_grid(
                    [np.asarray(jnp.asarray(data["rgb"])),
                     np.asarray(pkg["render"])],
                    f"{cfg.logdir}/train/{t_iter:06d}.png")
            if cfg.train.save_progress_images and t_iter > 0 \
                    and t_iter % cfg.train.progress_save_interval == 0 \
                    and cfg.mode in ("human", "human_scene") \
                    and self.human is not None:
                # canonical-avatar progress strip (reference
                # gs_trainer.py:384-385 render_canonical
                # is_train_progress=True); frames become the train
                # progress video at the end of train()
                try:
                    self._save_progress_frame(t_iter)
                except Exception as e:          # noqa: BLE001
                    print(f"WARNING: progress image({t_iter}) failed "
                          f"(continuing training): {e}")
            if t_iter > 0 and t_iter % cfg.train.save_ckpt_interval == 0:
                self.save_ckpt(t_iter)
            # Periodic eval/anim are observability, not training state:
            # a transient failure there (e.g. this environment's remote-
            # compile relay dropping a connection) must not kill a long
            # training run. Training-step errors still propagate.
            if t_iter > 0 and t_iter % cfg.train.val_interval == 0 \
                    and self.val_dataset is not None:
                try:
                    self.validate(t_iter)
                except Exception as e:          # noqa: BLE001
                    print(f"WARNING: validate({t_iter}) failed "
                          f"(continuing training): {e}")
            if t_iter == 0:
                # reference gs_trainer.py:362-369: scene + canonical-
                # human PLY dumps and a canonical turntable at iter 0
                try:
                    self._iter0_dumps()
                except Exception as e:          # noqa: BLE001
                    print(f"WARNING: iter-0 dumps failed "
                          f"(continuing training): {e}")
            anim_every = int(cfg.train.get("anim_interval", 0) or 0)
            if t_iter > 0 and anim_every > 0 \
                    and t_iter % anim_every == 0:
                # reference gs_trainer.py:371-378: human PLY + animate +
                # canonical turntable every anim_interval
                try:
                    self._save_human_ply(t_iter)
                    if self.anim_dataset is not None:
                        self.animate(t_iter)
                    if cfg.mode in ("human", "human_scene") \
                            and self.human is not None:
                        self.render_canonical(
                            t_iter, nframes=cfg.human.canon_nframes)
                except Exception as e:          # noqa: BLE001
                    print(f"WARNING: animate({t_iter}) failed "
                          f"(continuing training): {e}")

    # -------------------------------------------------------- rendering

    def forward_models(self, data, dataset_idx=-1, ext_tfs=None,
                       use_dataset_pose=True):
        h_out = s_out = None
        if self.human is not None:
            kwargs = {}
            if use_dataset_pose:
                kwargs = {k: jnp.asarray(data[k]) for k in
                          ("global_orient", "body_pose", "betas", "transl")
                          if k in data}
            h_out = hgs.human_forward(
                self.human.params, self.human.state, self.fixed,
                self.human_cfg,
                smpl_scale=jnp.asarray(
                    data.get("smpl_scale", 1.0), jnp.float32).reshape(()),
                dataset_idx=max(dataset_idx, 0), ext_tfs=ext_tfs,
                compute_gt_lbs=False, **kwargs)
        if self.scene is not None:
            s_out = sgs.scene_forward(self.scene.gs)
        return h_out, s_out

    def render_frame(self, data, render_mode=None, bg=None, ext_tfs=None,
                     use_dataset_pose=True, outputs=None, budget=None):
        """Render one frame through a cached JITTED closure (one XLA
        dispatch; keyed on mode/size/budget/ext-structure). The eager
        path costs one remote dispatch per op through this environment's
        TPU-tunnel relay (~80 s/frame at 540p, measured during
        validate) and forfeits fusion everywhere else.

        outputs: optional tuple of pkg keys — the closure returns just
        those, so XLA dead-code-eliminates the rest (('n_slots',) makes
        a binning-only slot-demand probe that never runs the blend).
        budget: instance-budget override for this closure (defaults to
        the trainer's); rehearse_budget probes at a roomy cap with it."""
        render_mode = render_mode or self.cfg.mode
        if render_mode == "human_scene" and self.scene is None:
            render_mode = "human"
        if self.human is None and render_mode != "scene":
            render_mode = "scene"
        W, H = data["width"], data["height"]
        budget = int(budget or self._ibudget)
        key = ("rf", render_mode, W, H, budget,
               ext_tfs is not None, use_dataset_pose, outputs,
               int(self.cfg.tpu.get("gauss_shard", 0) or 0))
        fn = self._crop_metric_cache.get(key)
        if fn is None:
            fixed, hcfg = self.fixed, self.human_cfg
            rkw = self._eval_render_kw(budget)
            mode = render_mode

            @jax.jit
            def fn(h_params, h_state, s_gs, camera, go, bp, betas, transl,
                   smpl_scale, didx, ext, bgc):
                h_out = s_out = None
                if mode in ("human", "human_scene"):
                    pose_kw = dict(global_orient=go, body_pose=bp,
                                   betas=betas, transl=transl) \
                        if use_dataset_pose else {}
                    h_out = hgs.human_forward(
                        h_params, h_state, fixed, hcfg,
                        smpl_scale=smpl_scale, dataset_idx=didx,
                        ext_tfs=ext, compute_gt_lbs=False, **pose_kw)
                if mode in ("scene", "human_scene"):
                    s_out = sgs.scene_forward(s_gs)
                pkg = render_human_scene(
                    {"camera": camera, "width": W, "height": H},
                    h_out, s_out, bg_color=bgc, render_mode=mode, **rkw)
                return tuple(pkg[k] for k in outputs) if outputs else pkg
            self._crop_metric_cache[key] = fn
        z3 = jnp.zeros(3)
        out = fn(self.human.params if self.human is not None else None,
                 self.human.state if self.human is not None else None,
                 self.scene.gs if self.scene is not None else None,
                 data["camera"],
                 jnp.asarray(data.get("global_orient", z3)),
                 jnp.asarray(data.get("body_pose", jnp.zeros(69))),
                 jnp.asarray(data.get("betas", jnp.zeros(10))),
                 jnp.asarray(data.get("transl", z3)),
                 jnp.asarray(data.get("smpl_scale", 1.0),
                             jnp.float32).reshape(()),
                 jnp.int32(0), ext_tfs,
                 self.bg_color if bg is None else bg)
        # After rehearse_budget tightened the arena to 1.15x of PROBED
        # demand, a frame outside the rehearsed set can exceed it and
        # silently drop instances (ADVICE r4). Spot-check the first
        # render of each closure (one scalar fetch per cache key, not
        # per frame).
        if getattr(self, "_budget_rehearsed", False) and outputs is None:
            checked = self.__dict__.setdefault("_overflow_checked", set())
            if key not in checked:
                checked.add(key)
                if bool(out["overflowed"]):
                    print(f"WARNING: instance budget {budget} overflowed "
                          f"on a non-rehearsed render (closure {key[1]} "
                          f"{W}x{H}) — image drops instances; re-run "
                          f"rehearse_budget with these frames included")
        return out

    # ------------------------------------------------------ validation

    def _human_crop_metrics(self, img, gt, x0, y0, h, w):
        """Human-crop PSNR/SSIM/LPIPS at a STATIC bucketed shape.

        The reference crops img[x0:x1+1, y0:y1+1] per frame
        (gs_trainer.py:513-521) — a different static shape per bbox,
        i.e. a fresh XLA compile per val frame (measured ~80 s/frame
        through this environment's remote-compile relay). Instead:
        dynamic_slice a bucket-rounded window (64-px buckets, one
        compile per bucket pair), zero both images outside the true
        bbox, and compute count-normalized metrics. PSNR and SSIM are
        EXACT (zero padding contributes nothing / matches the
        reference's own zero-padded 'same' conv); LPIPS is EXACT too:
        the crop is rolled to the bucket origin and run through
        LPIPS.crop_call, which re-zeroes the canvas beyond the crop's
        extent after every conv (conv biases would otherwise leak
        nonzero values back across the crop edge) and takes valid-
        extent spatial means — equal to LPIPS on the dynamic crop
        (tests/test_lpips.py::test_crop_call_exact)."""
        H, W = img.shape[1], img.shape[2]
        bh = min(-(-h // 64) * 64, H)
        bw = min(-(-w // 64) * 64, W)
        key = (bh, bw)
        fn = self._crop_metric_cache.get(key)
        if fn is None:
            @jax.jit
            def fn(img, gt, x0, y0, h, w, lp):
                xs = jnp.clip(x0, 0, H - bh)
                ys = jnp.clip(y0, 0, W - bw)
                a = jax.lax.dynamic_slice(img, (0, xs, ys), (3, bh, bw))
                b = jax.lax.dynamic_slice(gt, (0, xs, ys), (3, bh, bw))
                rows = jnp.arange(bh)[None, :, None]
                cols = jnp.arange(bw)[None, None, :]
                valid = ((rows >= x0 - xs) & (rows < x0 - xs + h)
                         & (cols >= y0 - ys) & (cols < y0 - ys + w))
                a = jnp.where(valid, a, 0.0)
                b = jnp.where(valid, b, 0.0)
                n_valid = (h * w).astype(jnp.float32)
                mse = jnp.sum((a - b) ** 2) / (3.0 * n_valid)
                p = 20.0 * jnp.log10(
                    1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
                s = ssim_masked(a, b, valid, n_valid)
                # roll the crop to the bucket origin (crop_call needs
                # it there to track pooling-grid extents exactly)
                a0 = jnp.roll(a, (-(x0 - xs), -(y0 - ys)), axis=(1, 2))
                b0 = jnp.roll(b, (-(x0 - xs), -(y0 - ys)), axis=(1, 2))
                lpv = lp.crop_call(jnp.clip(a0, max=1.0)[None],
                                   b0[None], h, w)[0]
                return p, s, lpv
            self._crop_metric_cache[key] = fn
        return fn(img, gt, jnp.int32(x0), jnp.int32(y0), jnp.int32(h),
                  jnp.int32(w), self.lpips)

    def _val_frame(self, data, bg):
        """One eval frame — render + full-image PSNR/SSIM/LPIPS — as a
        SINGLE jitted call (cached per (mode, W, H)).

        Eager evaluation here costs one remote dispatch per XLA op in
        this environment (~85 ms each through the TPU-tunnel relay;
        projection+binning+SSIM+VGG ≈ hundreds of ops ≈ ~80 s/frame,
        measured) — and on any hardware it forfeits fusion. The reference
        has no such boundary (torch eager on-device, gs_trainer.py:448-537)."""
        W, H = data["width"], data["height"]
        mode = self.cfg.mode if (self.scene is not None
                                 or self.cfg.mode != "human_scene") \
            else "human"
        # keyed on the live instance budget: auto-grow (_check_budget)
        # must invalidate the cached closure, not silently render eval
        # frames at the stale smaller budget
        key = ("val", mode, W, H, self._ibudget,
               int(self.cfg.tpu.get("gauss_shard", 0) or 0))
        fn = self._crop_metric_cache.get(key)
        if fn is None:
            fixed, hcfg = self.fixed, self.human_cfg
            rkw = self._eval_render_kw()

            @jax.jit
            def fn(h_params, h_state, s_gs, camera, go, bp, betas, transl,
                   smpl_scale, gt, bg, lp):
                h_out = s_out = None
                if mode in ("human", "human_scene"):
                    h_out = hgs.human_forward(
                        h_params, h_state, fixed, hcfg, global_orient=go,
                        body_pose=bp, betas=betas, transl=transl,
                        smpl_scale=smpl_scale, dataset_idx=0,
                        compute_gt_lbs=False)
                if mode in ("scene", "human_scene"):
                    s_out = sgs.scene_forward(s_gs)
                pkg = render_human_scene(
                    {"camera": camera, "width": W, "height": H},
                    h_out, s_out, bg_color=bg, render_mode=mode, **rkw)
                img = pkg["render"]
                p = psnr(img, gt)
                s = ssim(img, gt)
                l = lp(jnp.clip(img, max=1.0)[None], gt[None])[0]
                return img, p, s, l
            self._crop_metric_cache[key] = fn
        hp = self.human.params if self.human is not None else None
        hs = self.human.state if self.human is not None else None
        sg = self.scene.gs if self.scene is not None else None
        z3 = jnp.zeros(3)
        return fn(hp, hs, sg, data["camera"],
                  jnp.asarray(data.get("global_orient", z3)),
                  jnp.asarray(data.get("body_pose", jnp.zeros(69))),
                  jnp.asarray(data.get("betas", jnp.zeros(10))),
                  jnp.asarray(data.get("transl", z3)),
                  jnp.asarray(data.get("smpl_scale", 1.0),
                              jnp.float32).reshape(()),
                  jnp.asarray(data["rgb"]), bg, self.lpips)

    def validate(self, t_iter=None):
        cfg = self.cfg
        iter_s = "final" if t_iter is None else f"{t_iter:06d}"
        bg = jnp.zeros(3)
        metrics: dict[str, list] = {}
        # without pretrained VGG weights the lpips numbers are internally
        # consistent but NOT comparable to the reference — label them
        lp_key = "hugs_lpips" if self.lpips.has_pretrained \
            else "hugs_lpips_uncalibrated"

        for idx in range(len(self.val_dataset)):
            data = self.val_dataset[idx]
            img, p_full, s_full, l_full = self._val_frame(data, bg)
            gt = jnp.asarray(data["rgb"])
            metrics.setdefault("hugs_psnr", []).append(float(p_full))
            metrics.setdefault("hugs_ssim", []).append(float(s_full))
            metrics.setdefault(lp_key, []).append(float(l_full))
            if cfg.mode in ("human", "human_scene") and "bbox" in data:
                x0, y0, x1, y1 = [int(v) for v in np.asarray(data["bbox"])]
                h, w = x1 - x0 + 1, y1 - y0 + 1
                if min(h, w) >= 8:
                    p, s, lp = self._human_crop_metrics(img, gt, x0, y0,
                                                        h, w)
                    metrics.setdefault("hugs_human_psnr", []).append(
                        float(p))
                    metrics.setdefault("hugs_human_ssim", []).append(
                        float(s))
                    metrics.setdefault(lp_key.replace(
                        "hugs_", "hugs_human_"), []).append(float(lp))
            if cfg.logdir:
                save_image_grid(
                    [np.asarray(gt), np.asarray(img)],
                    f"{cfg.logdir}/val/full_{iter_s}_{idx:03d}.png")

        out = {k: float(np.mean(v)) for k, v in metrics.items() if v}
        self.eval_metrics[iter_s] = out
        self._log_jsonl({"eval": iter_s, **out})
        if cfg.logdir:
            os.makedirs(f"{cfg.logdir}/val", exist_ok=True)
            with open(f"{cfg.logdir}/val/eval_{iter_s}.json", "w") as f:
                json.dump(out, f, indent=2)
        return out

    # ------------------------------------------------------- animation

    def _anim_render_one(self, W, H, render_mode):
        """Pure per-frame anim render fn (vmap/shard_map-able): frame =
        (camera, global_orient, body_pose, betas, transl, smpl_scale,
        ext_tfs) -> (3, H, W)."""
        fixed, hcfg = self.fixed, self.human_cfg
        rkw = self._render_kw()
        bgc = self.bg_color

        def render_one(h_params, h_state, s_gs, frame):
            cam, go, bp, betas, transl, smpl_scale, ext = frame
            h_out = hgs.human_forward(
                h_params, h_state, fixed, hcfg, global_orient=go,
                body_pose=bp, betas=betas, transl=transl,
                smpl_scale=smpl_scale, dataset_idx=0, ext_tfs=ext,
                compute_gt_lbs=False)
            s_out = sgs.scene_forward(s_gs) if s_gs is not None else None
            pkg = render_human_scene(
                {"camera": cam, "width": W, "height": H}, h_out, s_out,
                bg_color=bgc, render_mode=render_mode, **rkw)
            return pkg["render"]

        return render_one

    def _animate_batched(self, batch_size, mesh=None):
        """Render the anim split in stacked batches: frames are vmapped
        on one device or data-sharded over `mesh` via
        batch_render_sharded (BASELINE config 5: AMASS mocap at batch>1
        on sharded chips). Per-frame parity vs the batch=1 loop is
        tested in tests/test_batch.py."""
        ds = self.anim_dataset
        n = len(ds)
        datas = [ds[i] for i in range(n)]
        W, H = datas[0]["width"], datas[0]["height"]

        def fields(d):
            ext = (jnp.asarray(d["manual_trans"]),
                   jnp.asarray(d["manual_rotmat"]),
                   jnp.asarray(d["manual_scale"]).reshape(()))
            return (d["camera"], jnp.asarray(d["global_orient"]),
                    jnp.asarray(d["body_pose"]), jnp.asarray(d["betas"]),
                    jnp.asarray(d["transl"]),
                    jnp.asarray(d.get("smpl_scale", 1.0),
                                jnp.float32).reshape(()), ext)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[fields(d) for d in datas])
        pad = (-n) % batch_size
        if pad:  # repeat the last frame up to a full batch
            stacked = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)]), stacked)
        render_mode = "human_scene" if (
            self.cfg.mode == "human_scene" and self.scene is not None) \
            else "human"
        render_one = self._anim_render_one(W, H, render_mode)
        h_params, h_state = self.human.params, self.human.state
        s_gs = self.scene.gs if render_mode == "human_scene" else None
        if mesh is not None:
            from hugs_tpu.parallel.shard import batch_render_sharded

            def run(chunk):
                return batch_render_sharded(
                    lambda fr: render_one(h_params, h_state, s_gs, fr),
                    chunk, mesh)
        else:
            rb = jax.jit(jax.vmap(render_one,
                                  in_axes=(None, None, None, 0)))

            def run(chunk):
                return rb(h_params, h_state, s_gs, chunk)

        frames = []
        for c0 in range(0, n + pad, batch_size):
            chunk = jax.tree.map(lambda x: x[c0:c0 + batch_size], stacked)
            frames += [np.asarray(im) for im in run(chunk)]
        return frames[:n]

    def animate(self, t_iter=None, keep_images=True, batch_size=None,
                mesh=None):
        if self.anim_dataset is None:
            return []
        iter_s = "final" if t_iter is None else f"{t_iter:06d}"
        anim_dir = f"{self.cfg.logdir}/anim/{iter_s}" \
            if self.cfg.logdir else None
        bsz = int(batch_size
                  or self.cfg.train.get("anim_batch_size", 1) or 1)
        if bsz > 1 and self.human is not None \
                and len(self.anim_dataset) > 1:
            frames = self._animate_batched(bsz, mesh=mesh)
            if anim_dir:
                for idx, fr in enumerate(frames):
                    save_png(fr, f"{anim_dir}/{idx:05d}.png")
        else:
            frames = []
            for idx in range(len(self.anim_dataset)):
                data = self.anim_dataset[idx]
                ext_tfs = (jnp.asarray(data["manual_trans"]),
                           jnp.asarray(data["manual_rotmat"]),
                           jnp.asarray(data["manual_scale"]).reshape(()))
                pkg = self.render_frame(data, ext_tfs=ext_tfs)
                frames.append(np.asarray(pkg["render"]))
                if anim_dir:
                    save_png(frames[-1], f"{anim_dir}/{idx:05d}.png")
        if anim_dir and len(frames) > 1:
            # reference writes an ffmpeg video per animate() call
            # (gs_trainer.py:582-586 via utils/general.py:86-92)
            create_video(anim_dir,
                         f"{self.cfg.logdir}/anim/anim_{iter_s}.mp4",
                         fps=20)
        return frames

    def render_canonical(self, t_iter=None, nframes=8, img_size=128,
                         pose_type=None):
        """Rotating-camera renders of the canonical avatar (reference
        render_canonical, gs_trainer.py:588-684); called at iter 0 and
        every anim_interval like the reference train loop
        (gs_trainer.py:362-378)."""
        from hugs_tpu.data.cameras import get_rotating_camera, \
            get_smpl_static_params
        iter_s = "final" if t_iter is None else f"{t_iter:06d}"
        cams = get_rotating_camera(img_size=img_size, dist=5.0,
                                   nframes=nframes)
        betas = self.human.params.betas
        sp = get_smpl_static_params(
            betas, pose_type or self.cfg.human.canon_pose_type)
        out_dir = f"{self.cfg.logdir}/canon/{iter_s}" \
            if self.cfg.logdir else None
        frames = []
        for cp in cams:
            data = dict(sp, **cp)
            pkg = self.render_frame(data, render_mode="human")
            frames.append(np.asarray(pkg["render"]))
            if out_dir:
                save_png(frames[-1], f"{out_dir}/{len(frames):05d}.png")
        if out_dir and len(frames) > 1:
            create_video(out_dir,
                         f"{self.cfg.logdir}/canon/canon_{iter_s}.mp4",
                         fps=10)
        return frames

    def _iter0_dumps(self):
        """Iter-0 snapshot dumps (reference gs_trainer.py:362-369):
        scene splat PLY, canonical human PLY, canonical turntable."""
        cfg = self.cfg
        if self.scene is not None:
            gs = self.scene.gs
            alive = np.asarray(gs.alive)
            from hugs_tpu.utils.ply import save_gaussian_ply
            save_gaussian_ply(
                f"{cfg.logdir}/meshes/scene_000000_splat.ply",
                np.asarray(gs.xyz)[alive],
                np.asarray(gs.features_dc)[alive],
                np.asarray(gs.features_rest)[alive],
                np.asarray(gs.opacity)[alive],
                np.asarray(gs.scaling)[alive],
                np.asarray(gs.rotation)[alive])
        self._save_human_ply(0)
        if cfg.mode in ("human", "human_scene") and self.human is not None:
            self.render_canonical(0, nframes=cfg.human.canon_nframes)

    def _save_human_ply(self, t_iter):
        """Canonical human-Gaussian PLY dump (reference save_ply(
        human_gs_out, meshes/human_{iter}_splat.ply) at iter 0 and every
        anim_interval, gs_trainer.py:362-375). One cached jitted closure
        — the canonical attrs are pose-independent, so any pose works;
        eager per-op dispatch would cost ~85 ms/op through this
        environment's TPU relay."""
        if self.human is None or not self.cfg.logdir:
            return
        iter_s = "final" if t_iter is None else f"{t_iter:06d}"
        fn = self._crop_metric_cache.get("human_ply")
        if fn is None:
            fixed, hcfg = self.fixed, self.human_cfg

            @jax.jit
            def fn(h_params, h_state):
                o = hgs.human_forward(
                    h_params, h_state, fixed, hcfg,
                    global_orient=jnp.zeros(3), body_pose=jnp.zeros(69),
                    betas=h_params.betas, transl=jnp.zeros(3),
                    smpl_scale=jnp.float32(1.0), compute_gt_lbs=False)
                return {k: o[k] for k in
                        ("xyz_canon", "shs", "opacity", "scales_canon",
                         "rotq_canon", "alive")}
            self._crop_metric_cache["human_ply"] = fn
        from hugs_tpu.utils.vis import save_human_ply
        save_human_ply(
            jax.device_get(fn(self.human.params, self.human.state)),
            f"{self.cfg.logdir}/meshes/human_{iter_s}_splat.ply")

    # ------------------------------------------------------ checkpoints

    def save_ckpt(self, t_iter=None):
        if not self.cfg.logdir_ckpt:
            return
        iter_s = "final" if t_iter is None else f"{t_iter:06d}"
        ckpt_io.save(self.cfg.logdir_ckpt, iter_s, human=self.human,
                     scene=self.scene)
        if self.scene is not None and self.cfg.logdir:
            gs = self.scene.gs
            alive = np.asarray(gs.alive)
            from hugs_tpu.utils.ply import save_gaussian_ply
            save_gaussian_ply(
                f"{self.cfg.logdir}/meshes/scene_{iter_s}_splat.ply",
                np.asarray(gs.xyz)[alive],
                np.asarray(gs.features_dc)[alive],
                np.asarray(gs.features_rest)[alive],
                np.asarray(gs.opacity)[alive],
                np.asarray(gs.scaling)[alive],
                np.asarray(gs.rotation)[alive])

    def load_latest_ckpt(self):
        loaded = ckpt_io.load_latest(self.cfg.logdir_ckpt,
                                     human=self.human, scene=self.scene)
        if loaded is None:
            return False
        human, scene = loaded
        if human is not None:
            self.human = human
        if scene is not None:
            self.scene = scene
        return True

    def compact_for_eval(self):
        """Right-size the per-Gaussian arrays to the live population
        (scene_gs.compact / human_gs.compact_for_inference) for
        eval/animation: the training capacity keeps padded rows so
        densification never recompiles, but every eval frame pays them
        in projection/LBS/binning — measured 2.5x frame time on the
        flagship checkpoint (evidence/fps_trained_tpu.json). Rebuilds
        optimizer state at the new shapes, so it is EVAL-ONLY."""
        if not self.cfg.eval:
            raise RuntimeError(
                "compact_for_eval rebuilds optimizer state and must not "
                "run mid-training (set cfg.eval)")
        # fine-grained (2k/4k) buckets, not pow2: projection/LBS/binning
        # pay every row per frame and a pow2 bucket wastes up to 2x rows
        # (measured +6% serving FPS on the r5 flagship ckpt, 89.9->95.5,
        # evidence/fps_trained_tpu.json)
        if self.human is not None:
            n_h = int(jnp.sum(self.human.state.alive))
            params, state, _ = hgs.compact_for_inference(
                self.human.params, self.human.state, {},
                bucket=-(-max(n_h, 1) // 2048) * 2048)
            self.human = init_human_train_state(params, state)
        if self.scene is not None:
            n_s = int(jnp.sum(self.scene.gs.alive))
            self.scene = init_scene_train_state(sgs.compact(
                self.scene.gs, bucket=-(-max(n_s, 1) // 4096) * 4096))

    def rehearse_budget(self, frames=None, probe_cap=1 << 18):
        """Eval-only: right-size the instance budget from measured
        demand (TPU-native serving practice; no reference counterpart).

        Binning/sort/pack cost is INDEX-bound on the STATIC budget
        (~7ns/slot, render/tiles.py), and the training budget carries
        densification headroom an eval run never uses. This dry-runs
        the given frames (default: the val + anim datasets — exactly
        what validate()/animate() will render) through a binning-only
        probe closure (outputs=('n_slots',) dead-code-eliminates the
        blend), then sets the budget to max demand x 1.15 in
        8192-granularity buckets. Every cached render closure keys on
        the budget, so validate/animate/render_frame all pick it up.
        Returns the new budget. Measured with the same machinery:
        9.1 -> 14.7 FPS on the 932k-slot stress animation
        (evidence/fps_bench_tpu.json)."""
        if not self.cfg.eval:
            raise RuntimeError("rehearse_budget shrinks the densify "
                               "headroom and must not run mid-training "
                               "(set cfg.eval)")
        if frames is None:
            frames = []
            for ds in (self.val_dataset, self.anim_dataset):
                if ds is not None:
                    frames.extend(ds[i] for i in range(len(ds)))
        cap = max(self._ibudget, probe_cap)
        demand = 0
        for data in frames:
            ext = None
            if "manual_trans" in data:
                ext = (jnp.asarray(data["manual_trans"]),
                       jnp.asarray(data["manual_rotmat"]),
                       jnp.asarray(data["manual_scale"]).reshape(()))
            # n_slots is a LOWER BOUND once the probe cap itself clips
            # (tiles.py:349-353) — a clipped probe would tighten the
            # budget below true demand and every later render of that
            # frame would silently drop instances (ADVICE r4). Grow the
            # cap and re-probe until the probe itself fits.
            for _ in range(8):
                n_slots, over = self.render_frame(
                    data, ext_tfs=ext, outputs=("n_slots", "overflowed"),
                    budget=cap)
                if not bool(over):
                    break
                cap = max(cap * 2,
                          -(-(int(n_slots) * 3 // 2) // 8192) * 8192)
            else:
                raise RuntimeError(
                    f"rehearse_budget: probe still overflowed at cap "
                    f"{cap} — scene demand is pathological")
            demand = max(demand, int(n_slots))
        if demand:
            self._ibudget = min(
                max(1 << 14, -(-(demand * 23 // 20) // 8192) * 8192),
                cap)
            # non-rehearsed frames (render_canonical, caller-supplied
            # pose lists) now run at 1.15x of PROBED demand; flag so
            # render_frame spot-checks their first render (ADVICE r4)
            self._budget_rehearsed = True
        return self._ibudget


def render_poses(trainer: "GaussianTrainer", camera_params: list,
                 smpl_params: dict, bg_color: str = "white"):
    """Batch-render the avatar under given cameras/poses with the
    canonical decode computed ONCE (reference render_poses + forward_test,
    gs_trainer.py:686-747) — the inference-time fast path.

    Serving-time arena sizing (TPU-native; no reference counterpart):
    binning/sort/pack cost is INDEX-bound on the STATIC instance budget
    (~7ns/slot, tiles.py), and the training budget carries worst-case
    training-view headroom. A REHEARSAL PASS first measures every
    frame's slot demand through a binning-only jitted probe (pulling
    only n_slots lets XLA dead-code-eliminate the blend), then the real
    renders run at max_demand x 1.15 in 8192-granularity buckets —
    measured 9.1 -> 14.7 FPS on the 932k-slot stress workload
    (evidence/fps_bench_tpu.json). A frame that still overflows (probe
    demand is a lower bound once instances are dropped) grows the
    bucket 1.5x and re-renders.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hugs_tpu.models import human_gs as hgs
    from hugs_tpu.render import render_human_scene

    bg = jnp.ones(3) if bg_color == "white" else jnp.zeros(3)
    canon = hgs.canon_forward(trainer.human.params, trainer.human.state,
                              trainer.human_cfg)
    # pure-inference loop: right-size the per-Gaussian rows locally
    # (does not touch the trainer's states; identical renders)
    h_params, h_state, canon = hgs.compact_for_inference(
        trainer.human.params, trainer.human.state, canon)
    fixed, hcfg = trainer.fixed, trainer.human_cfg
    rkw = trainer._render_kw()

    def frame_fn(width, height, budget, outputs):
        @jax.jit
        def fn(hp, hs, camera, go, bp, betas, transl, scale):
            h_out = hgs.human_forward(
                hp, hs, fixed, hcfg, canon_out=canon,
                compute_gt_lbs=False, global_orient=go, body_pose=bp,
                betas=betas, transl=transl, smpl_scale=scale)
            pkg = render_human_scene(
                {"camera": camera, "width": width, "height": height},
                h_out, None, bg_color=bg, render_mode="human",
                **dict(rkw, instance_budget=budget))
            return tuple(pkg[k] for k in outputs)
        return fn

    def args_of(cp):
        data = dict(smpl_params, **cp)
        return (data, h_params, h_state, data["camera"],
                jnp.asarray(data["global_orient"]).reshape(3),
                jnp.asarray(data["body_pose"]).reshape(-1)[:69],
                jnp.asarray(data["betas"]).reshape(10),
                jnp.asarray(data["transl"]).reshape(3),
                jnp.asarray(data["smpl_scale"], jnp.float32).reshape(()))

    # rehearsal: binning-only slot-demand probe at a roomy static cap
    probe_budget = max(trainer._ibudget, 1 << 18)
    probes = {}
    demand = 0
    for cp in camera_params:
        data, *args = args_of(cp)
        wh = (data["width"], data["height"])
        if wh not in probes:
            probes[wh] = frame_fn(*wh, probe_budget, ("n_slots",))
        demand = max(demand, int(probes[wh](*args)[0]))
    budget = min(max(1 << 14, -(-(demand * 23 // 20) // 8192) * 8192),
                 probe_budget)

    renders = {}
    imgs = []
    for fi, cp in enumerate(camera_params):
        data, *args = args_of(cp)
        wh = (data["width"], data["height"])
        b = budget
        for _ in range(8):          # n_slots is a lower bound once
            key = (wh, b)           # instances drop; 1.5x converges fast
            if key not in renders:
                renders[key] = frame_fn(*wh, b, ("render", "n_slots",
                                                 "overflowed"))
            img, n_slots, over = renders[key](*args)
            if not bool(over):
                break
            b = -(-(int(n_slots) * 3 // 2) // 8192) * 8192
        else:
            # still clipped after all grow-retries: the appended image
            # drops instances — say so instead of silently degrading
            # (ADVICE r4)
            print(f"WARNING: render_poses frame {fi} still overflows "
                  f"the instance budget after retries (final budget "
                  f"{b}, demand > {int(n_slots)}) — image is degraded")
        imgs.append(np.asarray(img))
    return imgs
