"""Fully-sharded joint training step over a 2-D ('data', 'tile') mesh.

Data parallelism x image-band parallelism for HUGS training — new
TPU-native capability (the reference is single-GPU, batch 1):

  - mesh axis 'data': each row of devices trains on a different frame
    (camera + pose + target image);
  - mesh axis 'tile': within a row, devices own horizontal pixel bands of
    that frame's render;
  - parameters are replicated; per-device gradients of the local band
    loss are psum'd over BOTH axes (one fused all-reduce over ICI), then
    the group-Adam update runs replicated.

The photometric loss inside is decomposable L1 (+ optional per-band SSIM
— windows are band-local, a deliberate approximation noted in the loss
docs) so the psum of band losses equals the full-image loss.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hugs_tpu.models import human_gs as hgs
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.render.project import project_gaussians
from hugs_tpu.render.tiles import bin_gaussians, TILE
from hugs_tpu.render.blend import blend_tiles
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
    tile_cap: int = 256,
    instance_budget: int = 1 << 14,
    tile: int = TILE,
    ssim_w: float = 0.0,
    l1_w: float = 0.8,
):
    """Build the jitted sharded step.

    Returned step signature:
      step(jstate, cameras, targets, masks, smpl_scales, dataset_idxs,
           human_lrs, scene_lrs) -> (jstate, aux)
    where cameras/targets/... have leading dim = mesh.shape['data'].
    """
    n_tile = mesh.shape["tile"]
    band_h = _band_height(height, n_tile, tile)
    n_data = mesh.shape["data"]

    def worker(h_params, h_state, s_gs, h_opt, s_opt,
               camera, target, smpl_scale, dataset_idx,
               h_lrs, s_lrs):
        # camera/target sharded over 'data': local shard has 1 frame
        camera = jax.tree.map(lambda x: x[0], camera)
        target = target[0]
        smpl_scale = smpl_scale[0]
        dataset_idx = dataset_idx[0]

        t = jax.lax.axis_index("tile")
        y0 = (t * band_h).astype(jnp.float32)

        def local_loss(h_params, s_params):
            h_out = hgs.human_forward(h_params, h_state, fixed, cfg,
                                      smpl_scale=smpl_scale,
                                      dataset_idx=dataset_idx)
            s_out = sgs.scene_forward(sgs.with_params(s_gs, s_params))
            attrs = {
                k: jnp.concatenate([h_out[k], s_out[k]], axis=0)
                for k in ("xyz", "scales", "rotq", "opacity")}
            shs = jnp.concatenate([h_out["shs"], s_out["shs"]], axis=0)
            alive = jnp.concatenate([h_out["alive"], s_out["alive"]])
            pg = project_gaussians(attrs["xyz"], attrs["scales"],
                                   attrs["rotq"], attrs["opacity"], shs,
                                   camera, width, height,
                                   h_out["active_sh_degree"], alive=alive)
            pg = pg._replace(mean2d=pg.mean2d - jnp.stack(
                [jnp.zeros_like(y0), y0]))
            bins = bin_gaussians(pg, width, band_h, instance_budget, tile)
            img = blend_tiles(pg, bins, width, band_h,
                              jnp.zeros(3), tile_cap, tile)
            # band of the target (pad target height to n_tile*band_h)
            tgt = jax.lax.dynamic_slice_in_dim(
                jnp.pad(target, ((0, 0), (0, n_tile * band_h - height),
                                 (0, 0))),
                t * band_h, band_h, axis=1)
            # decomposable L1: sum abs err / full-image pixel count
            loss = l1_w * jnp.sum(jnp.abs(img - tgt)) / (3 * height * width)
            if ssim_w > 0.0:
                from hugs_tpu.losses.basic import ssim
                loss = loss + ssim_w * (1.0 - ssim(img, tgt)) / n_tile
            return loss / n_data

        loss, (h_grads, s_grads) = jax.value_and_grad(
            local_loss, argnums=(0, 1))(h_params, sgs.params_of(s_gs))

        # one fused all-reduce over the whole mesh
        h_grads, s_grads, loss = jax.lax.psum(
            (h_grads, s_grads, loss), axis_name=("data", "tile"))

        h_new, h_opt2 = group_adam_update(
            h_grads._asdict(), h_opt, h_params._asdict(), h_lrs)
        s_new, s_opt2 = group_adam_update(
            s_grads, s_opt, sgs.params_of(s_gs), s_lrs)
        return (hgs.HumanGS(**h_new), sgs.with_params(s_gs, s_new),
                h_opt2, s_opt2, loss)

    rep = P()
    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep,
                  P("data"), P("data"), P("data"), P("data"), rep, rep),
        out_specs=(rep, rep, rep, rep, rep),
        check_vma=False,
    )

    @jax.jit
    def step(jstate: JointTrainState, cameras, targets, smpl_scales,
             dataset_idxs, h_lrs, s_lrs):
        h_params2, s_gs2, h_opt2, s_opt2, loss = sharded(
            jstate.human.params, jstate.human.state, jstate.scene.gs,
            jstate.human.opt, jstate.scene.opt,
            cameras, targets, smpl_scales, dataset_idxs, h_lrs, s_lrs)
        return JointTrainState(
            human=HumanTrainState(params=h_params2, state=jstate.human.state,
                                  opt=h_opt2),
            scene=SceneTrainState(gs=s_gs2, opt=s_opt2)), {"loss": loss}

    return step
