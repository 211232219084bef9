"""Scene-only 3DGS training step, fully jittable.

The reference's hot loop (gs_trainer.py:218-391, scene branch) re-expressed
as two pure functions that stay on-device:
  - `scene_train_step`: forward render -> loss -> grads -> group-Adam
    update -> densification-stat accumulation. Jit once, run every step.
  - `scene_densify_step`: densify/clone/split/prune + optional opacity
    reset, also jittable (fixed capacity), invoked every
    densification_interval steps by the host loop.

The viewspace (screen) gradient needed for densification stats is obtained
functionally: the render adds a zeros `mean2d_grad_hook`, and we take
grads w.r.t. that hook alongside the model params — no .grad mutation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.render import render
from hugs_tpu.render.camera import Camera
from hugs_tpu.losses.basic import l1_loss, ssim
from hugs_tpu.train.optim import GroupAdamState, group_adam_init, \
    group_adam_update, expon_lr


class SceneTrainState(NamedTuple):
    gs: sgs.SceneGS
    opt: GroupAdamState


def make_scene_lrs(cfg_lr, spatial_lr_scale: float):
    """Per-group LRs (reference scene.py:196-219). Returns
    (static dict, xyz schedule fn)."""
    sched = expon_lr(
        lr_init=cfg_lr.position_init * spatial_lr_scale,
        lr_final=cfg_lr.position_final * spatial_lr_scale,
        lr_delay_mult=cfg_lr.position_delay_mult,
        max_steps=cfg_lr.position_max_steps,
    )
    static = {
        "features_dc": cfg_lr.feature,
        "features_rest": cfg_lr.feature / 20.0,
        "opacity": cfg_lr.opacity,
        "scaling": cfg_lr.scaling,
        "rotation": cfg_lr.rotation,
    }
    return static, sched


def init_scene_train_state(gs: sgs.SceneGS) -> SceneTrainState:
    return SceneTrainState(gs=gs, opt=group_adam_init(sgs.params_of(gs)))


@partial(jax.jit, static_argnames=("width", "height", "l1_w", "ssim_w",
                                   "backend", "instance_budget", "tile_cap", "tile"))
def scene_train_step(
    state: SceneTrainState,
    camera: Camera,
    gt_image: jnp.ndarray,        # (3, H, W)
    bg: jnp.ndarray,              # (3,)
    xyz_lr: jnp.ndarray,          # scalar (host computes from schedule)
    static_lrs: dict,
    *,
    width: int,
    height: int,
    l1_w: float = 0.8,
    ssim_w: float = 0.2,
    backend: str = "tiled",
    instance_budget: int = 0,
    tile_cap: int = 1024,
    tile: int | None = None,
):
    gs = state.gs
    params = sgs.params_of(gs)
    hook = jnp.zeros((gs.capacity, 2))

    def loss_fn(params, hook):
        g = sgs.with_params(gs, params)
        out = sgs.scene_forward(g)
        pkg = render(out["xyz"], out["scales"], out["rotq"], out["opacity"],
                     out["shs"], camera, width, height, bg=bg,
                     active_sh_degree=out["active_sh_degree"],
                     alive=out["alive"], mean2d_grad_hook=hook,
                     backend=backend,
                     instance_budget=instance_budget or 4 * gs.capacity,
                     tile_cap=tile_cap, tile=tile)
        img = pkg["render"]
        loss = l1_w * l1_loss(img, gt_image) + \
            ssim_w * (1.0 - ssim(img, gt_image))
        return loss, pkg

    (loss, pkg), (grads, hook_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, hook)

    lrs = dict(static_lrs, xyz=xyz_lr)
    new_params, new_opt = group_adam_update(grads, state.opt, params, lrs)
    new_gs = sgs.with_params(gs, new_params)
    # Hook grads are d(loss)/d(pixel-space mean2d); the reference CUDA
    # backward returns viewspace grads scaled by ddelx_dx = 0.5*W
    # (0.5*H for y), and densify_grad_threshold is calibrated to those
    # units — convert before accumulating.
    vs_grad = hook_grad * jnp.array([0.5 * width, 0.5 * height])
    new_gs = sgs.add_densification_stats(
        new_gs, vs_grad, pkg["radii"], pkg["visibility_filter"])

    aux = {"loss": loss, "psnr_mse": jnp.mean((pkg["render"] - gt_image) ** 2),
           "overflowed": pkg["overflowed"],
           "n_instances": pkg["n_instances"],
           "n_slots": pkg["n_slots"],
           "n_visible": jnp.sum(pkg["visibility_filter"])}
    return SceneTrainState(gs=new_gs, opt=new_opt), aux


@partial(jax.jit, static_argnames=("grad_threshold", "min_opacity",
                                   "max_screen_size", "percent_dense",
                                   "do_reset_opacity", "max_n_gaussians"))
def scene_densify_step(
    state: SceneTrainState,
    key: jax.Array,
    extent: float,
    *,
    grad_threshold: float = 0.0002,
    min_opacity: float = 0.005,
    max_screen_size: float | None = None,
    percent_dense: float = 0.01,
    do_reset_opacity: bool = False,
    max_n_gaussians: int | None = None,
):
    moments = [state.opt.mu, state.opt.nu]
    gs, moments, info = sgs.densify_and_prune(
        state.gs, moments, key, grad_threshold, min_opacity, extent,
        max_screen_size, percent_dense, max_n_gaussians=max_n_gaussians)
    if do_reset_opacity:
        gs, moments = sgs.reset_opacity(gs, moments)
    opt = state.opt._replace(mu=moments[0], nu=moments[1])
    return SceneTrainState(gs=gs, opt=opt), info
