"""Multi-chip sharded rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.3); this is new
TPU-native design. Two parallel axes map naturally onto a TPU slice:

  'tile'  — image-space parallelism: Gaussians replicated, horizontal
            pixel BANDS sharded across chips. No communication in the
            forward blend (each chip owns its pixels); the backward's
            grad-psum for the replicated Gaussian attributes is inserted
            by shard_map's transpose and rides ICI. This is the analog of
            sequence parallelism for splatting (SURVEY.md §5).
  'data'  — frame/batch parallelism for batch>1 animation rendering and
            multi-frame training: everything replicated except the
            per-frame camera/pose inputs.

Band rendering reuses the single-chip pipeline unchanged: a band is just
the same projected Gaussians with mean2d shifted into band-local
coordinates, binned against the band's tile grid.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hugs_tpu.render.camera import Camera
from hugs_tpu.render.project import project_gaussians, update_mean2d
from hugs_tpu.render.tiles import bin_gaussians, TILE
from hugs_tpu.render.blend import blend_tiles


def make_mesh(shape=None, axis_names=("tile",)) -> Mesh:
    """Mesh over all available devices; default 1-D 'tile' axis."""
    devs = np.array(jax.devices())
    if shape is None:
        shape = (len(devs),)
    return Mesh(devs.reshape(shape), axis_names)


def _band_height(height: int, n_bands: int, tile) -> int:
    from hugs_tpu.render.tiles import tile_wh
    th = tile_wh(tile)[1]
    per = -(-height // n_bands)
    return -(-per // th) * th


def render_tile_sharded(
    means3d, scales, rotq, opacity, shs,
    camera: Camera,
    width: int, height: int,
    mesh: Mesh,
    bg=None,
    active_sh_degree=0,
    scaling_modifier: float = 1.0,
    alive=None,
    mean2d_grad_hook=None,
    instance_budget: int | None = None,
    tile_cap: int = 1024,
    tile: int = TILE,
    axis: str = "tile",
):
    """Differentiable tile-sharded render -> (3, H, W).

    Each device projects the full (replicated) Gaussian set, shifts it
    into its band's local frame, and bins+blends only its band. The
    instance budget is per-device (bands see ~1/D of the instances).
    """
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    n = means3d.shape[0]
    n_bands = mesh.shape[axis]
    band_h = _band_height(height, n_bands, tile)
    budget = instance_budget or max(4 * n // n_bands, 1 << 14)
    if alive is None:
        alive = jnp.ones(n, bool)
    if mean2d_grad_hook is None:
        mean2d_grad_hook = jnp.zeros((n, 2))
    active_sh_degree = jnp.asarray(active_sh_degree)

    def band_render(means3d, scales, rotq, opacity, shs, camera, bg,
                    active_sh_degree, alive, hook):
        d = jax.lax.axis_index(axis)
        y0 = (d * band_h).astype(jnp.float32)
        pg = project_gaussians(means3d, scales, rotq, opacity, shs, camera,
                               width, height, active_sh_degree,
                               scaling_modifier, alive=alive)
        pg = update_mean2d(pg, hook - jnp.stack([jnp.zeros_like(y0), y0]))
        bins = bin_gaussians(pg, width, band_h, budget, tile, align=1)
        img = blend_tiles(pg, bins, width, band_h, bg, tile_cap, tile)
        return img  # (3, band_h, W)

    spec_rep = P()
    out = shard_map(
        band_render, mesh=mesh,
        in_specs=(spec_rep,) * 10,
        out_specs=P(None, axis, None),
    )(means3d, scales, rotq, opacity, shs, camera, bg, active_sh_degree,
      alive, mean2d_grad_hook)
    return out[:, :height, :]


def batch_render_sharded(render_one, frames, mesh: Mesh, axis: str = "data"):
    """Render a batch of frames data-parallel: `render_one(frame)` maps a
    single frame pytree -> (3, H, W); frames is a stacked pytree with
    leading batch axis divisible by the mesh axis size."""
    def shard_fn(frames):
        return jax.vmap(render_one)(frames)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )(frames)
