"""Fully-sharded joint training step over a 2-D ('data', 'tile') mesh,
with FULL single-device loss parity.

Data parallelism x image-band parallelism for HUGS training — new
TPU-native capability (the reference is single-GPU, batch 1; the loss
being reproduced exactly is hugs/losses/loss.py:46-162):

  - mesh axis 'data': each row of devices trains on a different frame
    (camera + pose + target image + PRNG key);
  - mesh axis 'tile': within a row, devices own horizontal pixel bands of
    the frame's render. Only the RASTERIZER is band-sharded — the bands
    are all_gather'ed (a few MB over ICI) and the dense loss (L1, exact
    full-image SSIM, patch-LPIPS, humansep pass, LBS) runs replicated on
    the gathered image. Loss FLOPs are ~1% of raster FLOPs, so
    replicating them buys exact parity for free; the gather's AD
    transpose routes each chip's pixel gradients back to its band.
  - per-chip grads are psum'd over BOTH axes (one fused all-reduce over
    ICI). Through the band render the psum assembles partitioned
    partial grads; the LBS term (which does not flow through pixels) is
    gated to the tile=0 chip so the psum counts it exactly once.
  - densification stats ride the same psum: the screen-space mean2d
    gradient hook (zeros parameter added to pg.mean2d) is differentiated
    per band and psum'd into the full per-Gaussian stat, then split
    human/scene exactly like the single-device joint step.

The returned step's loss trajectory matches `joint_train_step` to fp
tolerance at n_data=1 (tests/test_sharded_train.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hugs_tpu.models import human_gs as hgs
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.render.project import project_gaussians, update_mean2d
from hugs_tpu.render.tiles import ALIGN, bin_gaussians, TILE
from hugs_tpu.render.blend import blend_tiles
from hugs_tpu.losses.loss import HumanSceneLoss
from hugs_tpu.train.optim import group_adam_update
from hugs_tpu.train.human_step import HumanTrainState
from hugs_tpu.train.scene_step import SceneTrainState
from hugs_tpu.train.joint_step import JointTrainState
from hugs_tpu.parallel.shard import _band_height


def make_dp_tile_train_step(
    mesh: Mesh,
    fixed: hgs.HumanGSFixed,
    cfg: hgs.HumanGSConfig,
    *,
    width: int,
    height: int,
    loss_fn: HumanSceneLoss | None = None,
    lpips=None,
    tile_cap: int = 256,
    instance_budget: int = 1 << 14,
    tile: int = TILE,
    backend: str = "tiled",
    optim_scene: bool = True,
    mode: str = "human_scene",
):
    """Build the jitted sharded joint train step.

    Returned step signature:
      step(jstate, cameras, targets, masks, bgs, human_bgs, smpl_scales,
           dataset_idxs, keys, h_xyz_lr, h_static_lrs, s_xyz_lr,
           s_static_lrs) -> (jstate, aux)
    where cameras/targets/masks/bgs/human_bgs/smpl_scales/dataset_idxs/
    keys have leading dim = a multiple of mesh.shape['data'] (the trained
    batch; each chip row vmaps over its local batch of
    dim / n_data frames), and targets/masks are full-resolution frames.

    backend: 'tiled' (XLA blend) or 'pallas' (the TPU kernel; runs in
    interpret mode off-TPU, so the CPU-mesh tests exercise the real
    kernel path's plumbing under shard_map).

    mode: 'human_scene' (joint render+loss) or 'human' — the staged-
    start phase before scene.opt_start_iter (reference
    gs_trainer.py:248-252: scene not rendered, render_mode='human'
    loss masking, scene optimizer untouched). The step keeps the SAME
    signature/aux shapes; scene grads are structurally zero (pass
    optim_scene=False so Adam doesn't run on them)."""
    if loss_fn is None:
        loss_fn = HumanSceneLoss()
    human_only = mode == "human"
    n_tile = mesh.shape["tile"]
    band_h = _band_height(height, n_tile, tile)
    n_data = mesh.shape["data"]
    render_human_separate = loss_fn.l_humansep_w > 0.0 and not human_only
    lf = loss_fn._replace(lpips=lpips) if lpips is not None else loss_fn

    def band_render(pg, bg, t):
        """Blend this chip's band of an already-projected Gaussian set
        and gather the full frame (band coords: shift mean2d)."""
        y0 = (t * band_h).astype(jnp.float32)
        pg = update_mean2d(pg, -jnp.stack([jnp.zeros_like(y0), y0]))
        bins = bin_gaussians(pg, width, band_h, instance_budget, tile,
                             align=1 if backend != "pallas" else ALIGN)
        if backend == "pallas":
            from hugs_tpu.render.pallas_blend import blend_tiles_pallas
            img = blend_tiles_pallas(pg, bins, width, band_h, bg, tile)
        else:
            img = blend_tiles(pg, bins, width, band_h, bg, tile_cap, tile)
        full = jax.lax.all_gather(img, "tile", axis=1, tiled=True)
        return full[:, :height, :], bins.overflowed, bins.n_slots

    def worker(h_params, h_state, s_gs, camera, gt, mask, bg, hbg,
               smpl_scale, dataset_idx, key):
        # data-sharded args arrive with a leading LOCAL batch axis: the
        # step trains n_data * B frames per call (B > 1 when the trainer
        # batch_size exceeds the data-axis device count — the batch IS
        # the 'data' axis, extended per-chip by vmap).
        frames = (camera, gt, mask, bg, hbg, smpl_scale, dataset_idx, key)
        local_b = gt.shape[0]
        t = jax.lax.axis_index("tile")
        h_cap = h_params.xyz.shape[0]
        s_cap = s_gs.capacity
        hook = jnp.zeros((h_cap + s_cap, 2))
        lbs_gate = (t == 0).astype(jnp.float32)

        def frame_loss(h_params, s_params, hook, frame):
            camera, gt, mask, bg, hbg, smpl_scale, dataset_idx, key = \
                frame
            h_out = hgs.human_forward(h_params, h_state, fixed, cfg,
                                      smpl_scale=smpl_scale,
                                      dataset_idx=dataset_idx)
            if human_only:
                # staged start: the scene is neither rendered nor
                # differentiated; s_params stays out of the graph so
                # its grads are structurally zero
                xyz, scales, rotq = (h_out["xyz"], h_out["scales"],
                                     h_out["rotq"])
                opac, shs, alive = (h_out["opacity"], h_out["shs"],
                                    h_out["alive"])
                hook_used = hook[:h_cap]
            else:
                s_out = sgs.scene_forward(sgs.with_params(s_gs, s_params))
                xyz = jnp.concatenate([h_out["xyz"], s_out["xyz"]], axis=0)
                scales = jnp.concatenate(
                    [h_out["scales"], s_out["scales"]], axis=0)
                rotq = jnp.concatenate([h_out["rotq"], s_out["rotq"]],
                                       axis=0)
                opac = jnp.concatenate(
                    [h_out["opacity"], s_out["opacity"]], axis=0)
                shs = jnp.concatenate([h_out["shs"], s_out["shs"]], axis=0)
                alive = jnp.concatenate([h_out["alive"], s_out["alive"]])
                hook_used = hook
            pg = project_gaussians(xyz, scales, rotq, opac, shs, camera,
                                   width, height,
                                   h_out["active_sh_degree"], alive=alive)
            pg = update_mean2d(pg, hook_used)
            img, overflowed, n_slots = band_render(pg, bg, t)
            pkg = {"render": img,
                   "radii": pg.radius,
                   "visibility_filter": pg.mask & (pg.radius > 0)}
            if render_human_separate:
                # no hook on the separate pass: the reference takes
                # viewspace grads from the main pass only (renderer.py
                # render_human_scene, gs_trainer.py:316-342)
                pg_h = project_gaussians(
                    h_out["xyz"], h_out["scales"], h_out["rotq"],
                    h_out["opacity"], h_out["shs"], camera, width, height,
                    h_out["active_sh_degree"], alive=h_out["alive"])
                img_h, _, _ = band_render(pg_h, hbg, t)
                pkg["human_img"] = img_h
                pkg["human_radii"] = pg_h.radius
                pkg["human_visibility_filter"] = pg_h.mask & (
                    pg_h.radius > 0)
            data = {"camera": camera, "width": width, "height": height,
                    "rgb": gt, "mask": mask}
            # human phase: bg doubles as the composite color, matching
            # the single-device human_step (human_step.py:186-187)
            total, loss_dict, _ = lf(key, data, pkg, h_out,
                                     render_mode=mode, bg_color=bg,
                                     human_bg_color=bg if human_only
                                     else hbg)
            # Replication accounting for the grad psum over 'tile':
            #  - pixel terms: the loss is computed identically on every
            #    tile chip from the gathered image, and all_gather's
            #    transpose SUMS the n_tile identical cotangents before
            #    scattering each chip its band — so the psum'd grad would
            #    be n_tile x. Scale the pixel objective by 1/n_tile.
            #  - the LBS term does not flow through pixels at all: every
            #    chip would contribute the full grad, so gate it to the
            #    tile=0 chip (counted exactly once).
            # The REPORTED loss keeps the exact unscaled value.
            lbs = loss_dict.get("lbs", jnp.float32(0.0))
            objective = (total - lbs) / n_tile + lbs_gate * lbs
            # radii/visibility for densify stats, merged human/scene here
            # so the per-frame aux stays small under vmap. Human stats
            # come from the separate pass when humansep is on
            # (single-device joint_step parity).
            h_radii = pkg.get("human_radii", pkg["radii"][:h_cap])
            h_vis = pkg.get("human_visibility_filter",
                            pkg["visibility_filter"][:h_cap])
            if human_only:     # scene not rendered: empty densify stats
                s_radii = jnp.zeros((s_cap,), h_radii.dtype)
                s_vis = jnp.zeros((s_cap,), jnp.bool_)
            else:
                s_radii = pkg["radii"][h_cap:]
                s_vis = pkg["visibility_filter"][h_cap:]
            radii = jnp.concatenate([h_radii, s_radii])
            vis = jnp.concatenate([h_vis, s_vis])
            aux = (total, loss_dict, overflowed, n_slots, radii, vis,
                   h_out["opacity"], h_out["scales_canon"],
                   h_out["rotmat_canon"])
            return objective / (n_data * local_b), aux

        def batch_loss(h_params, s_params, hook):
            objs, auxs = jax.vmap(
                lambda fr: frame_loss(h_params, s_params, hook, fr))(
                frames)
            return jnp.sum(objs), auxs

        (_, auxs), grads = \
            jax.value_and_grad(batch_loss, argnums=(0, 1, 2),
                               has_aux=True)(
                h_params, sgs.params_of(s_gs), hook)
        h_grads, s_grads, hook_grad = grads
        (total, loss_dict, overflowed, n_slots, radii, vis,
         h_opac, h_scales_c, h_rotmat_c) = auxs
        # reduce the local batch: mean losses, any-overflow, max instance
        # count, any-frame visibility; canonical quantities (opacity,
        # canon scales/rotations) are frame-independent -> frame 0.
        total = jnp.mean(total)
        loss_dict = jax.tree.map(lambda x: jnp.mean(x, axis=0), loss_dict)
        overflowed = jnp.any(overflowed)
        n_slots = jnp.max(n_slots)
        radii = jnp.max(radii, axis=0)
        vis = jnp.any(vis, axis=0)
        h_opac, h_scales_c, h_rotmat_c = (
            h_opac[0], h_scales_c[0], h_rotmat_c[0])

        # one fused all-reduce over the whole mesh
        h_grads, s_grads, hook_grad = jax.lax.psum(
            (h_grads, s_grads, hook_grad), axis_name=("data", "tile"))
        loss = jax.lax.pmean(total, axis_name=("data", "tile"))
        loss_dict = jax.lax.pmean(loss_dict, axis_name=("data", "tile"))
        overflowed = jax.lax.psum(
            overflowed.astype(jnp.int32), ("data", "tile")) > 0
        n_slots = jax.lax.pmax(n_slots, ("data", "tile"))
        # radii/visibility are replicated within a data row; max/or over
        # 'data' matches the densify semantics "visible in any trained
        # frame".
        radii = jax.lax.pmax(radii, "data")
        vis = jax.lax.pmax(vis.astype(jnp.int32), "data") > 0
        return (h_grads, s_grads, hook_grad, loss, loss_dict, overflowed,
                n_slots, radii, vis, h_opac, h_scales_c, h_rotmat_c)

    rep = P()
    dshard = P("data")
    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(rep, rep, rep,
                  dshard, dshard, dshard, dshard, dshard, dshard, dshard,
                  dshard),
        out_specs=(rep,) * 12,
        check_vma=False,
    )

    @jax.jit
    def step(jstate: JointTrainState, cameras, targets, masks, bgs,
             human_bgs, smpl_scales, dataset_idxs, keys,
             h_xyz_lr, h_static_lrs, s_xyz_lr, s_static_lrs):
        hstate, sstate = jstate.human, jstate.scene
        (h_grads, s_grads, hook_grad, loss, loss_dict, overflowed, n_slots,
         radii, vis, h_opac, h_scales_c, h_rotmat_c) = sharded(
            hstate.params, hstate.state, sstate.gs,
            cameras, targets, masks, bgs, human_bgs, smpl_scales,
            dataset_idxs, keys)

        h_cap = hstate.params.xyz.shape[0]
        h_lrs = dict(h_static_lrs, xyz=h_xyz_lr)
        h_new, h_opt = group_adam_update(
            h_grads._asdict(), hstate.opt, hstate.params._asdict(), h_lrs)
        if optim_scene:
            s_lrs = dict(s_static_lrs, xyz=s_xyz_lr)
            s_new, s_opt = group_adam_update(
                s_grads, sstate.opt, sgs.params_of(sstate.gs), s_lrs)
            new_s_gs = sgs.with_params(sstate.gs, s_new)
        else:
            s_opt, new_s_gs = sstate.opt, sstate.gs

        # densification stats from the psum'd hook gradient (units:
        # reference viewspace, see scene_step.py)
        vs_grad = hook_grad * jnp.array([0.5 * width, 0.5 * height])
        new_h_state = hgs.add_densification_stats(
            hstate.state, vs_grad[:h_cap], radii[:h_cap], vis[:h_cap])
        new_s_gs = sgs.add_densification_stats(
            new_s_gs, vs_grad[h_cap:], radii[h_cap:], vis[h_cap:])

        aux = {"loss": loss, "loss_dict": loss_dict,
               "overflowed": overflowed, "n_slots": n_slots,
               "opacity": h_opac, "scales_canon": h_scales_c,
               "rotmat_canon": h_rotmat_c}
        return JointTrainState(
            human=HumanTrainState(params=hgs.HumanGS(**h_new),
                                  state=new_h_state, opt=h_opt),
            scene=SceneTrainState(gs=new_s_gs, opt=s_opt)), aux

    return step
