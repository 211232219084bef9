"""Joint human+scene training step (hugs_human_scene.yaml parity).

The reference trains both Gaussian sets through one merged render
(gs_trainer.py:218-351 with mode='human_scene'): concat human-first,
depth-sorted blend, optional separate human pass for the humansep loss,
then split the screen-space gradients back per set for each model's
densification stats. All of that happens here in one jitted function.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.models import human_gs as hgs
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.render import render_human_scene
from hugs_tpu.render.camera import Camera
from hugs_tpu.losses.loss import HumanSceneLoss
from hugs_tpu.train.optim import group_adam_update
from hugs_tpu.train.human_step import HumanTrainState
from hugs_tpu.train.scene_step import SceneTrainState


class JointTrainState(NamedTuple):
    human: HumanTrainState
    scene: SceneTrainState


@partial(jax.jit, static_argnames=("cfg", "loss_fn", "width", "height",
                                   "backend", "instance_budget", "tile_cap", "tile",
                                   "render_human_separate", "optim_scene"))
def joint_train_step(
    jstate: JointTrainState,
    fixed: hgs.HumanGSFixed,
    camera: Camera,
    gt_image: jnp.ndarray,
    gt_mask: jnp.ndarray,
    bg: jnp.ndarray,                 # per-step random bg (reference :254)
    human_bg: jnp.ndarray,
    smpl_scale: jnp.ndarray,
    dataset_idx: jnp.ndarray,
    key: jax.Array,
    human_xyz_lr: jnp.ndarray,
    human_static_lrs: dict,
    scene_xyz_lr: jnp.ndarray,
    scene_static_lrs: dict,
    lpips=None,
    *,
    cfg: hgs.HumanGSConfig,
    loss_fn: HumanSceneLoss,
    width: int,
    height: int,
    backend: str = "tiled",
    instance_budget: int = 0,
    tile_cap: int = 1024,
    tile: int | None = None,
    render_human_separate: bool = False,
    optim_scene: bool = True,
):
    hstate, sstate = jstate.human, jstate.scene
    h_cap = hstate.params.xyz.shape[0]
    s_cap = sstate.gs.capacity
    hook = jnp.zeros((h_cap + s_cap, 2))

    def compute_loss(h_params, s_params, hook):
        h_out = hgs.human_forward(h_params, hstate.state, fixed, cfg,
                                  smpl_scale=smpl_scale,
                                  dataset_idx=dataset_idx)
        s_out = sgs.scene_forward(sgs.with_params(sstate.gs, s_params))
        data = {"camera": camera, "width": width, "height": height,
                "rgb": gt_image, "mask": gt_mask}
        pkg = render_human_scene(
            data, h_out, s_out, bg_color=bg, human_bg_color=human_bg,
            render_mode="human_scene",
            render_human_separate=render_human_separate,
            backend=backend, mean2d_grad_hook=hook,
            instance_budget=instance_budget or 4 * (h_cap + s_cap),
            tile_cap=tile_cap, tile=tile)
        lf = loss_fn._replace(lpips=lpips) if lpips is not None else loss_fn
        total, loss_dict, _ = lf(key, data, pkg, h_out,
                                 render_mode="human_scene", bg_color=bg,
                                 human_bg_color=human_bg)
        return total, (pkg, h_out, loss_dict)

    (loss, (pkg, h_out, loss_dict)), grads = jax.value_and_grad(
        compute_loss, argnums=(0, 1, 2), has_aux=True)(
        hstate.params, sgs.params_of(sstate.gs), hook)
    h_grads, s_grads, hook_grad = grads

    # --- optimizer updates ---
    h_lrs = dict(human_static_lrs, xyz=human_xyz_lr)
    h_new, h_opt = group_adam_update(h_grads._asdict(), hstate.opt,
                                     hstate.params._asdict(), h_lrs)
    new_h_params = hgs.HumanGS(**h_new)

    if optim_scene:
        s_lrs = dict(scene_static_lrs, xyz=scene_xyz_lr)
        s_new, s_opt = group_adam_update(s_grads, sstate.opt,
                                         sgs.params_of(sstate.gs), s_lrs)
        new_s_gs = sgs.with_params(sstate.gs, s_new)
    else:
        s_opt, new_s_gs = sstate.opt, sstate.gs

    # --- densification stats, split human-first (gs_renderer.py:84-98) ---
    # pixel-space -> reference viewspace units (0.5*W / 0.5*H scale);
    # see scene_step.py for the unit convention.
    vs_grad = hook_grad * jnp.array([0.5 * width, 0.5 * height])
    new_h_state = hgs.add_densification_stats(
        hstate.state, vs_grad[:h_cap], pkg["human_radii"],
        pkg["human_visibility_filter"])
    new_s_gs = sgs.add_densification_stats(
        new_s_gs, vs_grad[h_cap:], pkg["scene_radii"],
        pkg["scene_visibility_filter"])

    aux = {"loss": loss, "loss_dict": loss_dict,
           "overflowed": pkg["overflowed"],
           "n_instances": pkg["n_instances"],
           "n_slots": pkg["n_slots"],
           "render": pkg["render"],
           "opacity": h_out["opacity"],
           "scales_canon": h_out["scales_canon"],
           "rotmat_canon": h_out["rotmat_canon"]}
    return JointTrainState(
        human=HumanTrainState(params=new_h_params, state=new_h_state,
                              opt=h_opt),
        scene=SceneTrainState(gs=new_s_gs, opt=s_opt)), aux
