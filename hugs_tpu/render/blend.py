"""Tiled alpha-blend compositing, pure JAX (XLA) backend.

The TPU-shaped formulation of front-to-back splat blending: instead of the
CUDA kernel's per-pixel sequential loop with early-out, each tile computes
a dense (K, P) alpha matrix (K = per-tile Gaussian capacity, P = pixels),
takes an exclusive log-space cumsum along K for transmittance, and
contracts colors against the weight matrix with a matmul (MXU). Fully
differentiable via AD; the Pallas backend (pallas_blend.py) implements the
same math with explicit chunking + custom VJP.

Per-tile Gaussian lists come sorted front-to-back from tiles.bin_gaussians.
Tiles whose instance count exceeds the static per-tile capacity are
truncated (farthest Gaussians dropped) — capacity is sized so this is rare
and detectable (`overflow` output).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hugs_tpu.render.oracle import gaussian_alpha, LOG_TEPS
from hugs_tpu.render.project import ProjectedGaussians
from hugs_tpu.render.tiles import TileBins, TILE, tile_grid, tile_wh


def blend_tiles(pg: ProjectedGaussians, bins: TileBins, width: int,
                height: int, bg: jnp.ndarray, tile_cap: int,
                tile: int = TILE, tiles_per_batch: int = 16) -> jnp.ndarray:
    """Composite all tiles. Returns (3, H, W) in [0, 1]."""
    nx, ny = tile_grid(width, height, tile)
    tw, th = tile_wh(tile)
    num_tiles = nx * ny
    P = tw * th

    opac = jnp.where(pg.mask, pg.opacity, 0.0)

    # Pad the instance list by tile_cap so the fixed-size dynamic slices
    # below never hit the clamp-shift hazard: XLA clamps an
    # out-of-bounds dynamic_slice START downward, which would silently
    # offset a near-the-end tile's rows against its `live` mask. With
    # alignment waste inside the budget (tiles.bin_gaussians), a full
    # layout legitimately ends flush with the array.
    gauss_id = jnp.pad(bins.gauss_id, (0, tile_cap))

    def one_tile(t):
        start = bins.starts[t]
        count = bins.ends[t] - start
        k = jnp.arange(tile_cap, dtype=jnp.int32)
        inst = jax.lax.dynamic_slice_in_dim(gauss_id, start, tile_cap)
        live = k < count
        gi = jnp.where(live, inst, 0)

        mean2d = pg.mean2d[gi]
        conic = pg.conic[gi]
        rgb = pg.rgb[gi]
        a_op = jnp.where(live, opac[gi], 0.0)

        ty, tx = t // nx, t % nx
        px = (tx * tw + jnp.arange(tw)).astype(jnp.float32)
        py = (ty * th + jnp.arange(th)).astype(jnp.float32)
        pxx, pyy = jnp.meshgrid(px, py)                  # (tile, tile)
        pxf, pyf = pxx.ravel(), pyy.ravel()              # (P,)

        alpha = gaussian_alpha(mean2d[:, None, :], conic[:, None, :],
                               a_op[:, None], pxf[None, :], pyf[None, :],
                               radius=pg.radius[gi][:, None])
        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=0)
        log_t_excl = jnp.concatenate(
            [jnp.zeros((1, P), alpha.dtype), log_t[:-1]], axis=0)
        trans = jnp.exp(log_t_excl)
        # [T_i >= T_EPS] early-termination indicator (oracle.py docstring)
        wmat = alpha * trans * (log_t_excl >= LOG_TEPS)   # (K, P)
        # full-f32 contraction: TPU default matmul precision is bf16,
        # which would put ~1e-3 noise on the composited colors
        color = jax.lax.dot_general(
            rgb, wmat, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        final_t = jnp.exp(log_t[-1]) * (log_t[-1] >= LOG_TEPS)
        color = color + bg[:, None] * final_t[None, :]
        return color                                      # (3, P)

    # Rematerialize each tile's blend in the backward pass: without this,
    # the (K, P) alpha/transmittance intermediates of every tile stay live
    # for the whole backward (~GBs at 540p); with it, the backward
    # recomputes them tile-by-tile from the (tiny) gathered inputs —
    # the same recompute-in-backward strategy as the CUDA kernel's
    # back-to-front replay.
    one_tile = jax.checkpoint(one_tile)

    def batch_fn(ts):
        return jax.vmap(one_tile)(ts)

    pad_tiles = (-num_tiles) % tiles_per_batch
    all_t = jnp.arange(num_tiles + pad_tiles, dtype=jnp.int32) % num_tiles
    tiled = jax.lax.map(batch_fn, all_t.reshape(-1, tiles_per_batch))
    tiled = tiled.reshape(-1, 3, th, tw)[:num_tiles]      # (T, 3, th, tw)

    # Assemble tiles into the padded image, then crop.
    img = tiled.reshape(ny, nx, 3, th, tw)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, ny * th, nx * tw)
    return jnp.clip(img[:, :height, :width], 0.0, 1.0)


def tile_overflow(bins: TileBins, tile_cap: int) -> jnp.ndarray:
    """True if any tile's instance list was truncated by tile_cap."""
    return jnp.max(bins.ends - bins.starts) > tile_cap
