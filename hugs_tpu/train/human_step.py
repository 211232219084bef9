"""Human-avatar training steps: init distillation + main loop, jitted.

Covers the reference's two training loops for the human model:
  - `distill_init`: the 7000-step MSE pre-fit of triplane+decoders to the
    mesh-derived init attributes (hugs/utils/init_opt.py:12-70), with the
    same ReduceLROnPlateau(patience=1000, factor=0.5) host-side schedule.
  - `human_train_step`: render-and-optimize step over photometric +
    LBS losses (gs_trainer.py:218-351, human branch).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.models import human_gs as hgs
from hugs_tpu.render import render
from hugs_tpu.render.camera import Camera
from hugs_tpu.losses.loss import HumanSceneLoss
from hugs_tpu.train.optim import GroupAdamState, group_adam_init, \
    group_adam_update, expon_lr


class HumanTrainState(NamedTuple):
    params: hgs.HumanGS
    state: hgs.HumanGSState
    opt: GroupAdamState


def make_human_lrs(cfg_lr, optim_pose=False, optim_betas=False,
                   optim_trans=False):
    """Group LRs (reference setup_optimizer, hugs_trimlp.py:667-707)."""
    sched = expon_lr(
        lr_init=cfg_lr.position_init * cfg_lr.smpl_spatial,
        lr_final=cfg_lr.position_final * cfg_lr.smpl_spatial,
        lr_delay_mult=cfg_lr.position_delay_mult,
        max_steps=cfg_lr.position_max_steps)
    static = {
        "triplane": cfg_lr.vembed,
        "geometry_dec": cfg_lr.geometry,
        "appearance_dec": cfg_lr.appearance,
        "deformation_dec": cfg_lr.deformation,
        "global_orient": cfg_lr.smpl_pose if optim_pose else 0.0,
        "body_pose": cfg_lr.smpl_pose if optim_pose else 0.0,
        "betas": cfg_lr.smpl_betas if optim_betas else 0.0,
        "transl": cfg_lr.smpl_trans if optim_trans else 0.0,
    }
    return static, sched


def init_human_train_state(params: hgs.HumanGS,
                           state: hgs.HumanGSState) -> HumanTrainState:
    return HumanTrainState(params=params, state=state,
                           opt=group_adam_init(params._asdict()))


def masked_mse(pred, target, alive):
    """Mean squared error over rows where alive (leading dim matches)."""
    m = alive.reshape((-1,) + (1,) * (pred.ndim - 1)).astype(pred.dtype)
    per_elem = jnp.sum(((pred - target) ** 2) * m)
    n_elem = jnp.maximum(jnp.sum(alive), 1.0) * (pred.size // pred.shape[0])
    return per_elem / n_elem


@partial(jax.jit, static_argnames=("cfg",))
def _distill_step(tstate: HumanTrainState, targets: dict, lr: jnp.ndarray,
                  cfg: hgs.HumanGSConfig):
    def loss_fn(params):
        out = hgs.canon_forward(params, tstate.state, cfg)
        alive = tstate.state.alive
        loss = 0.0
        keys = ["xyz_offsets", "scales", "rot6d_canon", "shs", "opacity"]
        if cfg.use_deformer:
            keys.append("lbs_weights")
        for k in keys:
            if out.get(k) is not None:
                loss = loss + masked_mse(out[k], targets[k], alive)
        if cfg.use_deformer and out.get("posedirs") is not None:
            loss = loss + jnp.mean((out["posedirs"] - targets["posedirs"]) ** 2)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(tstate.params)
    lrs = {"triplane": lr, "appearance_dec": lr, "geometry_dec": lr,
           "deformation_dec": lr * 0.5}
    new_params, new_opt = group_adam_update(
        grads._asdict(), tstate.opt, tstate.params._asdict(), lrs)
    return tstate._replace(params=hgs.HumanGS(**new_params), opt=new_opt), loss


@partial(jax.jit, static_argnames=("cfg", "n"))
def _distill_block(tstate: HumanTrainState, targets: dict,
                   sched: jnp.ndarray, cfg: hgs.HumanGSConfig, n: int):
    """n distillation steps in ONE device dispatch, with the
    ReduceLROnPlateau(patience=1000, factor=0.5) bookkeeping carried
    on-device (sched = (best, patience, lr)). A per-step host read of
    the loss costs a full relay round trip in this environment (~90 ms,
    measured; see the r3 trainer fix) — 7000 of them dominated the
    whole init-distillation wall clock."""
    def body(carry, _):
        ts, best, patience, lr = carry
        ts, loss = _distill_step(ts, targets, lr, cfg)
        improved = loss < best - 1e-9
        best = jnp.minimum(best, loss)
        patience = jnp.where(improved, 0, patience + 1)
        drop = patience > 1000
        lr = jnp.where(drop, lr * 0.5, lr)
        patience = jnp.where(drop, 0, patience)
        return (ts, best, patience, lr), loss

    (tstate, best, patience, lr), losses = jax.lax.scan(
        body, (tstate, sched[0], sched[1].astype(jnp.int32),
               sched[2]), None, length=n)
    return tstate, jnp.stack([best, patience.astype(jnp.float32), lr]), \
        losses


def distill_init(params: hgs.HumanGS, state: hgs.HumanGSState,
                 init_values: dict, cfg: hgs.HumanGSConfig,
                 num_steps: int = 7000, lr: float = 1e-3,
                 log_every: int = 0, block: int = 500):
    """Init distillation loop (reference optimize_init,
    hugs/utils/init_opt.py:12-70 semantics incl. the plateau LR decay).
    Returns params. Runs in `block`-step jitted scans — one host sync
    per block, not per step."""
    targets = {k: v for k, v in init_values.items() if k != "edges"}
    tstate = init_human_train_state(params, state)
    sched = jnp.array([jnp.inf, 0.0, lr], jnp.float32)
    done = 0
    while done < num_steps:
        n = min(block, num_steps - done)
        tstate, sched, losses = _distill_block(tstate, targets, sched,
                                               cfg, n)
        done += n
        if log_every:
            print(f"distill {done:05d}: loss {float(losses[-1]):.6f} "
                  f"lr {float(sched[2]):.2e}")
    return tstate.params


@partial(jax.jit, static_argnames=("cfg", "loss_fn", "width", "height",
                                   "backend", "instance_budget", "tile_cap", "tile"))
def human_train_step(
    tstate: HumanTrainState,
    fixed: hgs.HumanGSFixed,
    camera: Camera,
    gt_image: jnp.ndarray,
    gt_mask: jnp.ndarray,
    bg: jnp.ndarray,
    smpl_scale: jnp.ndarray,
    dataset_idx: jnp.ndarray,
    key: jax.Array,
    xyz_lr: jnp.ndarray,
    static_lrs: dict,
    lpips=None,                 # LPIPS params pytree (traced) or None
    *,
    cfg: hgs.HumanGSConfig,
    loss_fn: HumanSceneLoss,    # static: must carry lpips=None; the live
    #                             LPIPS params come via the `lpips` arg
    width: int,
    height: int,
    backend: str = "tiled",
    instance_budget: int = 0,
    tile_cap: int = 1024,
    tile: int | None = None,
):
    state = tstate.state
    cap = tstate.params.xyz.shape[0]
    hook = jnp.zeros((cap, 2))

    def compute_loss(params, hook):
        out = hgs.human_forward(params, state, fixed, cfg,
                                smpl_scale=smpl_scale,
                                dataset_idx=dataset_idx)
        pkg = render(out["xyz"], out["scales"], out["rotq"], out["opacity"],
                     out["shs"], camera, width, height, bg=bg,
                     active_sh_degree=out["active_sh_degree"],
                     alive=out["alive"], mean2d_grad_hook=hook,
                     backend=backend,
                     instance_budget=instance_budget or 4 * cap,
                     tile_cap=tile_cap, tile=tile)
        data = {"rgb": gt_image, "mask": gt_mask}
        lf = loss_fn._replace(lpips=lpips) if lpips is not None else loss_fn
        total, loss_dict, extras = lf(
            key, data, pkg, out, render_mode="human", bg_color=bg,
            human_bg_color=bg)
        return total, (pkg, out, loss_dict)

    (loss, (pkg, out, loss_dict)), (grads, hook_grad) = jax.value_and_grad(
        compute_loss, argnums=(0, 1), has_aux=True)(tstate.params, hook)

    lrs = dict(static_lrs, xyz=xyz_lr)
    new_params, new_opt = group_adam_update(
        grads._asdict(), tstate.opt, tstate.params._asdict(), lrs)
    # pixel-space -> reference viewspace units (0.5*W / 0.5*H scale);
    # see scene_step.py for the unit convention.
    vs_grad = hook_grad * jnp.array([0.5 * width, 0.5 * height])
    new_state = hgs.add_densification_stats(
        state, vs_grad, pkg["radii"], pkg["visibility_filter"])

    aux = {"loss": loss, "loss_dict": loss_dict,
           "overflowed": pkg["overflowed"],
           "n_instances": pkg["n_instances"],
           "n_slots": pkg["n_slots"],
           "n_visible": jnp.sum(pkg["visibility_filter"]),
           "opacity": out["opacity"], "scales_canon": out["scales_canon"],
           "rotmat_canon": out["rotmat_canon"]}
    return tstate._replace(params=hgs.HumanGS(**new_params), opt=new_opt,
                           state=new_state), aux


@partial(jax.jit, static_argnames=("grad_threshold", "min_opacity",
                                   "max_screen_size", "percent_dense",
                                   "max_n_gaussians"))
def human_densify_step(
    tstate: HumanTrainState,
    human_gs_out: dict,
    key: jax.Array,
    extent: float,
    *,
    grad_threshold: float = 0.0002,
    min_opacity: float = 0.005,
    max_screen_size: float | None = 20.0,
    percent_dense: float = 0.01,
    max_n_gaussians: int | None = None,
):
    mu, nu = tstate.opt.mu, tstate.opt.nu
    params, state, (mu_xyz, nu_xyz), info = hgs.densify_and_prune(
        tstate.params, tstate.state, [mu["xyz"], nu["xyz"]], human_gs_out,
        key, grad_threshold, min_opacity, extent, max_screen_size,
        percent_dense, max_n_gaussians=max_n_gaussians)
    opt = tstate.opt._replace(mu={**mu, "xyz": mu_xyz},
                              nu={**nu, "xyz": nu_xyz})
    return HumanTrainState(params=params, state=state, opt=opt), info
