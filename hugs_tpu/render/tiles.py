"""Tile binning for the splatting rasterizer, pure XLA ops.

TPU-native replacement for the CUDA rasterizer's atomics-based
duplicate-and-radix-sort binning: Gaussian->tile instance expansion with a
STATIC instance budget (jnp.repeat with total_repeat_length), a
lexicographic (tile, depth) jax.lax.sort, and searchsorted per-tile
ranges. Everything is static-shaped, so it jits once and never recompiles
as the live Gaussian set changes.

Tiles are TILE x TILE pixels (default 16; 16x16=256 pixels = 2x128 lanes,
and with f32 chunk math the blend kernel's VMEM footprint stays small).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.render.project import ProjectedGaussians

TILE = 16


ALIGN = 128  # per-tile segments start at multiples of this (the Pallas
#              blend streams CHUNK=128 instances per DMA, and Mosaic needs
#              provably lane-aligned dynamic slices)


class TileBins(NamedTuple):
    # Sorted, segment-ALIGNED Gaussian instance list + per-tile ranges.
    # Tile t owns slots [starts[t], starts[t] + roundup(count_t, ALIGN));
    # the first count_t = ends[t]-starts[t] are valid, the rest padding
    # (gauss_id 0, masked by count everywhere).
    gauss_id: jnp.ndarray   # (I_align,) int32 index into Gaussian arrays
    tile_id: jnp.ndarray    # (I_align,) int32 (== num_tiles for padding)
    starts: jnp.ndarray     # (T,) int32 ALIGN-multiple segment start
    ends: jnp.ndarray       # (T,) int32 starts + valid count
    n_instances: jnp.ndarray  # () int32 total valid instances (may exceed
    #                            the budget if overflowed)
    aligned_total: jnp.ndarray  # () int32 end of the last written segment
    overflowed: jnp.ndarray   # () bool: instance budget exceeded


def tile_grid(width: int, height: int, tile: int = TILE) -> tuple[int, int]:
    return (-(-width // tile), -(-height // tile))


def tile_spans(pg: ProjectedGaussians, width: int, height: int,
               tile: int = TILE):
    """Per-Gaussian covered tile rectangle [tx0, tx1) x [ty0, ty1)."""
    nx, ny = tile_grid(width, height, tile)
    r = pg.radius
    tx0 = jnp.clip(((pg.mean2d[:, 0] - r) / tile).astype(jnp.int32), 0, nx)
    ty0 = jnp.clip(((pg.mean2d[:, 1] - r) / tile).astype(jnp.int32), 0, ny)
    tx1 = jnp.clip(((pg.mean2d[:, 0] + r) / tile).astype(jnp.int32) + 1, 0, nx)
    ty1 = jnp.clip(((pg.mean2d[:, 1] + r) / tile).astype(jnp.int32) + 1, 0, ny)
    w = jnp.where(pg.mask, tx1 - tx0, 0)
    h = jnp.where(pg.mask, ty1 - ty0, 0)
    return tx0, ty0, w, h, nx, ny


def bin_gaussians(pg: ProjectedGaussians, width: int, height: int,
                  budget: int, tile: int = TILE) -> TileBins:
    """Build the depth-sorted per-tile instance lists.

    budget: STATIC total instance capacity I. If the true instance count
    exceeds it, later instances (by Gaussian index) are dropped and
    `overflowed` is set — callers size the budget so this never happens in
    steady state (it is checkable cheaply on-host).
    """
    n = pg.mean2d.shape[0]
    tx0, ty0, w, h, nx, ny = tile_spans(pg, width, height, tile)
    num_tiles = nx * ny
    counts = (w * h).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts          # exclusive
    total = offsets[-1] + counts[-1] if n else jnp.int32(0)

    gid = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                     total_repeat_length=budget)
    slot = jnp.arange(budget, dtype=jnp.int32)
    valid = slot < total
    rank = slot - offsets[gid]                      # instance rank within its Gaussian
    gw = jnp.maximum(w[gid], 1)
    tx = tx0[gid] + rank % gw
    ty = ty0[gid] + rank // gw
    tile_ids = jnp.where(valid, ty * nx + tx, num_tiles).astype(jnp.int32)

    depth = pg.depth[gid]
    tile_sorted, depth_sorted, gid_sorted = jax.lax.sort(
        (tile_ids, depth, gid), num_keys=2)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    raw_starts = jnp.searchsorted(tile_sorted, tids,
                                  side='left').astype(jnp.int32)
    raw_ends = jnp.searchsorted(tile_sorted, tids,
                                side='right').astype(jnp.int32)

    # re-layout into ALIGN-aligned per-tile segments
    counts = raw_ends - raw_starts
    seg = ((counts + ALIGN - 1) // ALIGN) * ALIGN
    astarts = (jnp.cumsum(seg) - seg).astype(jnp.int32)
    i_align = budget + ALIGN * num_tiles        # static worst case
    delta = astarts - raw_starts                # (T,)
    tclip = jnp.clip(tile_sorted, 0, num_tiles - 1)
    newpos = jnp.arange(budget, dtype=jnp.int32) + delta[tclip]
    newpos = jnp.where(tile_sorted < num_tiles, newpos, i_align)
    gauss_al = jnp.zeros(i_align, jnp.int32).at[newpos].set(
        gid_sorted, mode="drop")
    tile_al = jnp.full(i_align, num_tiles, jnp.int32).at[newpos].set(
        tile_sorted, mode="drop")

    return TileBins(gauss_id=gauss_al, tile_id=tile_al, starts=astarts,
                    ends=astarts + counts, n_instances=total,
                    aligned_total=astarts[-1] + seg[-1],
                    overflowed=total > budget)
