"""Gaussian-sharded scene TRAINING step: primitives sharded over chips
through the fragment-exchange renderer, full loss parity with the
single-device `scene_train_step`.

Closes the remaining half of the Gaussian-shard capability (VERDICT r4
item 4 option b): scenes whose Gaussian set is too large to replicate
per chip can now be TRAINED, not just served. The reference is
single-GPU (its scene loop is hugs/trainer/gs_trainer.py:218-391, scene
branch); this is new TPU-native capability layered on
parallel/gauss_shard.py:

  - each chip owns N/D Gaussians: projection, binning, and the Adam
    state shards with them (the optimizer update below runs under jit
    with inputs/outputs sharded over the 'gauss' axis — XLA keeps every
    per-Gaussian elementwise op local to the owner chip);
  - the blend runs band-parallel on exchanged fragments (one all_to_all
    forward, its transpose backward — fragment grads ride ICI back to
    each Gaussian's owner);
  - the dense loss (L1 + exact full-image SSIM) is computed on the
    band-sharded image; XLA inserts the reductions.
  - densification stats come from the same functional mean2d hook as
    the single-device step (d(loss)/d(hook) = viewspace grads), sharded
    over owners.

Loss trajectory == `scene_train_step` to fp tolerance
(tests/test_gauss_shard.py::test_gauss_sharded_train_step_parity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.losses.basic import l1_loss, ssim
from hugs_tpu.parallel.gauss_shard import render_gauss_sharded
from hugs_tpu.render.tiles import TILE
from hugs_tpu.train.optim import group_adam_update
from hugs_tpu.train.scene_step import SceneTrainState


def shard_scene_state(state: SceneTrainState, mesh: Mesh,
                      axis: str = "gauss") -> SceneTrainState:
    """Place every per-Gaussian array (params, stats, Adam moments) with
    its owner chip (leading dim sharded over `axis`); scalars stay
    replicated. Call once after init/densify so the train step's
    per-Gaussian math never leaves the owner."""
    rows = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == state.gs.capacity:
            return jax.device_put(x, rows)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)


def make_gauss_scene_train_step(
    mesh: Mesh,
    *,
    width: int,
    height: int,
    l1_w: float = 0.8,
    ssim_w: float = 0.2,
    local_budget: int | None = None,
    frag_cap: int | None = None,
    tile_cap: int = 1024,
    tile: int = TILE,
    backend: str = "tiled",
    axis: str = "gauss",
):
    """Build the jitted Gaussian-sharded scene train step.

    Returned step signature matches `scene_train_step`:
      step(state, camera, gt_image, bg, xyz_lr, static_lrs)
        -> (state, aux)
    """

    @jax.jit
    def step(state: SceneTrainState, camera, gt_image, bg, xyz_lr,
             static_lrs):
        gs = state.gs
        params = sgs.params_of(gs)
        hook = jnp.zeros((gs.capacity, 2))

        def loss_fn(params, hook):
            g = sgs.with_params(gs, params)
            out = sgs.scene_forward(g)
            pkg = render_gauss_sharded(
                out["xyz"], out["scales"], out["rotq"], out["opacity"],
                out["shs"], camera, width, height, mesh, bg=bg,
                active_sh_degree=out["active_sh_degree"],
                alive=out["alive"], local_budget=local_budget,
                frag_cap=frag_cap, tile_cap=tile_cap, tile=tile,
                axis=axis, backend=backend, mean2d_grad_hook=hook)
            img = pkg["render"]
            loss = l1_w * l1_loss(img, gt_image) + \
                ssim_w * (1.0 - ssim(img, gt_image))
            return loss, pkg

        (loss, pkg), (grads, hook_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, hook)

        lrs = dict(static_lrs, xyz=xyz_lr)
        new_params, new_opt = group_adam_update(grads, state.opt, params,
                                                lrs)
        new_gs = sgs.with_params(gs, new_params)
        vs_grad = hook_grad * jnp.array([0.5 * width, 0.5 * height])
        new_gs = sgs.add_densification_stats(
            new_gs, vs_grad, pkg["radii"], pkg["visibility_filter"])

        aux = {"loss": loss,
               "psnr_mse": jnp.mean((pkg["render"] - gt_image) ** 2),
               "overflowed": pkg["overflowed"],
               "frag_counts": pkg["frag_counts"],
               "n_visible": jnp.sum(pkg["visibility_filter"])}
        return SceneTrainState(gs=new_gs, opt=new_opt), aux

    return step
