"""Gaussian-parallel sharded rendering: primitives sharded over chips,
per-tile fragment exchange over ICI.

The second shard axis of the north star (BASELINE.json: "image tiles AND
Gaussian primitives sharded over chips"; SURVEY §2.3/§7 hard part 6) —
the reference is single-GPU, so this is new TPU-native design scaling the
behavior of its binning/blend (the CUDA rasterizer used at
hugs/renderer/gs_renderer.py:141-152).

Design (all static shapes, one collective):

  1. Each chip owns a contiguous shard of N/D Gaussians. It projects and
     bins ONLY its shard — against the FULL (padded) tile grid — using
     the unchanged single-chip `bin_gaussians`.
  2. The image is partitioned into D horizontal tile BANDS, band d owned
     by chip d. Because the local aligned instance list is tile-sorted,
     the instances destined for band e form one contiguous slice: the
     exchange is a single `all_to_all` of fixed-capacity fragment
     packets (projected features: mean2d/conic/rgb/opacity/radius +
     depth bits + global id).
  3. Each chip re-sorts its received D x frag_cap fragments by
     (local tile, depth, global id) — exactly the single-device blend
     order, ties included — rebuilds per-tile segments with one
     searchsorted, and alpha-blends its band with the unchanged
     `blend_tiles`.

Gradients flow through the exchange automatically: gather/sort/all_to_all
are linear in the float payload, so jax.grad inserts the transposed
all_to_all in the backward pass (fragment grads ride ICI back to the
owner chip of each Gaussian).

Load balance: Gaussians are spatially clustered, so per-(sender, band)
fragment counts are skewed; `frag_counts` in the returned aux measures
it. `frag_cap` bounds the per-pair packet (overflow is reported, not
silent)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hugs_tpu.render.camera import Camera
from hugs_tpu.render.project import project_gaussians, ProjectedGaussians
from hugs_tpu.render.tiles import (ALIGN, TileBins, bin_gaussians,
                                   pltpu_bits, tile_grid, TILE)
from hugs_tpu.render.blend import blend_tiles, tile_overflow
from hugs_tpu.parallel.shard import _band_height


def render_gauss_sharded(
    means3d, scales, rotq, opacity, shs,
    camera: Camera,
    width: int, height: int,
    mesh: Mesh,
    bg=None,
    active_sh_degree=0,
    scaling_modifier: float = 1.0,
    alive=None,
    local_budget: int | None = None,
    frag_cap: int | None = None,
    tile_cap: int = 1024,
    tile: int = TILE,
    axis: str = "gauss",
    backend: str = "tiled",
    mean2d_grad_hook=None,
):
    """Differentiable Gaussian-sharded render.

    Args:
      means3d..shs: full Gaussian set, N divisible by mesh.shape[axis];
        rows [d*N/D, (d+1)*N/D) land on chip d (contiguous, so global
        blend order matches the single-device renderer exactly).
      local_budget: static per-chip instance budget for the local shard's
        binning (default 4 * N/D).
      frag_cap: static per-(sender, band) fragment packet capacity
        (default local_budget — always safe; tighten to cut exchange
        volume and memory, overflow is reported in aux; measured sizing
        in evidence/gauss_frag_sizing.json).
      mean2d_grad_hook: optional zeros (N, 2) — added to each shard's
        projected mean2d so d(loss)/d(hook) yields the per-Gaussian
        viewspace gradient the densifier wants (same functional hook as
        render(); enables gauss-sharded TRAINING, parallel/gauss_train).

    Returns:
      dict with "render" (3, H, W), "overflowed" (bool: any local budget,
      packet, or tile_cap overflow), "frag_counts" (D, D) int32 — row d =
      instances chip d sent to each band (the load-balance skew matrix),
      "radii"/"visibility_filter" (N,) per-Gaussian densify stats.
    """
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    n = means3d.shape[0]
    D = mesh.shape[axis]
    assert n % D == 0, f"N={n} must be divisible by mesh axis {D}"
    n_local = n // D
    band_h = _band_height(height, D, tile)
    h_pad = D * band_h
    nx, ny_band = tile_grid(width, band_h, tile)
    tpd = nx * ny_band                     # tiles per device band
    num_tiles = tpd * D
    budget = local_budget or max(4 * n_local, 1 << 14)
    cap = frag_cap or budget
    if alive is None:
        alive = jnp.ones(n, bool)
    if mean2d_grad_hook is None:
        mean2d_grad_hook = jnp.zeros((n, 2))
    active_sh_degree = jnp.asarray(active_sh_degree)

    def worker(m, s, q, o, c, alive, hook, camera, bg, deg):
        d = jax.lax.axis_index(axis)
        pg = project_gaussians(m, s, q, o, c, camera, width, height, deg,
                               scaling_modifier, alive=alive)
        from hugs_tpu.render.project import update_mean2d
        pg = update_mean2d(pg, hook)
        # align=1: the fragment exchange consumes the dense sorted
        # layout (and re-aligns merged fragments itself for the Pallas
        # backend below), so per-shard budgets carry no padding waste
        # and the all-to-all packets stay tight.
        bins = bin_gaussians(pg, width, h_pad, budget, tile, align=1)
        i_align = bins.gauss_id.shape[0]

        # ---- per-aligned-slot fragment features (one column gather) ----
        gi = bins.gauss_id                               # (I_align,)
        starts_ext = jnp.concatenate(
            [bins.starts, bins.aligned_total[None]])
        slot = jnp.arange(i_align, dtype=jnp.int32)
        t_of_slot = jnp.clip(
            jnp.searchsorted(starts_ext, slot, side="right").astype(
                jnp.int32) - 1, 0, num_tiles - 1)
        valid = slot < bins.ends[t_of_slot]

        feat = jnp.concatenate(
            [pg.mean2d, pg.conic, pg.rgb,
             jnp.where(pg.mask, pg.opacity, 0.0)[:, None],
             pg.radius[:, None]], axis=1)               # (n_local, 10)
        frag_f = feat[gi]                                # (I_align, 10)
        frag_tile = jnp.where(valid, t_of_slot, num_tiles)
        frag_depth = pltpu_bits(pg.depth)[gi]
        frag_gid = d * jnp.int32(n_local) + gi

        # ---- pack per-destination packets (contiguous slices) ----
        base = starts_ext[jnp.arange(D) * tpd]           # (D,)
        stop = starts_ext[(jnp.arange(D) + 1) * tpd]
        idx = base[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        in_seg = idx < stop[:, None]
        idx_c = jnp.clip(idx, 0, i_align - 1)
        send_f = jnp.where(in_seg[..., None], frag_f[idx_c], 0.0)
        send_tile = jnp.where(in_seg, frag_tile[idx_c], num_tiles)
        send_depth = jnp.where(in_seg, frag_depth[idx_c], 2147483647)
        send_gid = jnp.where(in_seg, frag_gid[idx_c], 0)
        sent_counts = jnp.sum(
            (send_tile < num_tiles).astype(jnp.int32), axis=1)  # (D,)
        send_overflow = jnp.any(stop - base > cap)

        # ---- the one collective: fragment all-to-all over ICI ----
        recv_f = jax.lax.all_to_all(send_f, axis, 0, 0)
        recv_tile = jax.lax.all_to_all(send_tile, axis, 0, 0)
        recv_depth = jax.lax.all_to_all(send_depth, axis, 0, 0)
        recv_gid = jax.lax.all_to_all(send_gid, axis, 0, 0)

        # ---- local re-sort into exact global blend order ----
        t_loc = jnp.where(recv_tile.ravel() < num_tiles,
                          recv_tile.ravel() - d * tpd, tpd)
        fcols = tuple(recv_f.reshape(-1, 10).T)
        sorted_ops = jax.lax.sort(
            (t_loc, recv_depth.ravel(), recv_gid.ravel()) + fcols,
            num_keys=3)
        t_sorted = sorted_ops[0]
        f_sorted = jnp.stack(sorted_ops[3:], axis=1)     # (D*cap, 10)
        # pad by tile_cap rows so blend_tiles' fixed-size dynamic slices
        # never clamp-shift near the array end (padding rows are masked)
        t_sorted = jnp.concatenate(
            [t_sorted, jnp.full(tile_cap, tpd, jnp.int32)])
        f_sorted = jnp.concatenate(
            [f_sorted, jnp.zeros((tile_cap, 10))], axis=0)

        tids = jnp.arange(tpd, dtype=jnp.int32)
        f_starts = jnp.searchsorted(t_sorted, tids,
                                    side="left").astype(jnp.int32)
        f_ends = jnp.searchsorted(t_sorted, tids,
                                  side="right").astype(jnp.int32)

        y0 = (d * band_h).astype(jnp.float32)
        mean2d_loc = f_sorted[:, :2] - jnp.stack(
            [jnp.zeros_like(y0), y0])
        nfrag = t_sorted.shape[0]
        frag_mask = t_sorted < tpd
        if backend == "pallas":
            # Re-layout the densely tile-packed fragments into
            # ALIGN(=128)-aligned per-tile segments (the Pallas blend
            # DMA-streams CHUNK-aligned slices; same scatter+cummax
            # trick as tiles.bin_gaussians) and reuse the single-chip
            # kernel wholesale: pg_frag carries a feature-major feat
            # cache built straight from the received fragment rows, and
            # gauss_id maps aligned slots back to fragment indices.
            fcounts = f_ends - f_starts
            seg = ((fcounts + ALIGN - 1) // ALIGN) * ALIGN
            astarts = (jnp.cumsum(seg) - seg).astype(jnp.int32)
            i_align = nfrag + ALIGN * tpd
            delta = astarts - f_starts           # (tpd,) non-decreasing
            mark_pos = jnp.where(fcounts > 0, f_starts, nfrag)
            dmarks = jnp.zeros(nfrag, jnp.int32).at[mark_pos].max(
                delta, mode="drop")
            newpos = jnp.arange(nfrag, dtype=jnp.int32) \
                + jax.lax.cummax(dmarks)
            newpos = jnp.where(frag_mask, newpos, i_align)
            gauss_al = jnp.zeros(i_align, jnp.int32).at[newpos].set(
                jnp.arange(nfrag, dtype=jnp.int32), mode="drop")
            # feat rows r g b op mx my ca cb cc rad (pallas F_* order)
            feat = jnp.stack(
                [f_sorted[:, 5], f_sorted[:, 6], f_sorted[:, 7],
                 jnp.where(frag_mask, f_sorted[:, 8], 0.0),
                 mean2d_loc[:, 0], mean2d_loc[:, 1],
                 f_sorted[:, 2], f_sorted[:, 3], f_sorted[:, 4],
                 f_sorted[:, 9]], axis=0)        # (10, nfrag)
            pg_frag = ProjectedGaussians(
                mean2d=mean2d_loc, conic=f_sorted[:, 2:5],
                depth=jnp.zeros(nfrag), radius=f_sorted[:, 9],
                rgb=f_sorted[:, 5:8], opacity=f_sorted[:, 8],
                mask=frag_mask, feat=feat)
            bins_frag = TileBins(
                gauss_id=gauss_al, starts=astarts,
                ends=astarts + fcounts,
                n_instances=jnp.sum(fcounts),
                aligned_total=astarts[-1] + seg[-1],
                overflowed=jnp.bool_(False))
            from hugs_tpu.render.pallas_blend import blend_tiles_pallas
            img = blend_tiles_pallas(pg_frag, bins_frag, width, band_h,
                                     bg, tile)           # (3, band_h, W)
            cap_over = jnp.bool_(False)          # no per-tile cap here
        else:
            zi = jnp.zeros((), jnp.int32)
            pg_frag = ProjectedGaussians(
                mean2d=mean2d_loc, conic=f_sorted[:, 2:5],
                depth=jnp.zeros(nfrag), radius=f_sorted[:, 9],
                rgb=f_sorted[:, 5:8], opacity=f_sorted[:, 8],
                mask=frag_mask)
            bins_frag = TileBins(
                gauss_id=jnp.arange(nfrag, dtype=jnp.int32),
                starts=f_starts, ends=f_ends,
                n_instances=zi, aligned_total=zi,
                overflowed=jnp.bool_(False))
            img = blend_tiles(pg_frag, bins_frag, width, band_h, bg,
                              tile_cap, tile)            # (3, band_h, W)
            cap_over = tile_overflow(bins_frag, tile_cap)

        overflow = jax.lax.psum(
            (bins.overflowed | send_overflow | cap_over).astype(jnp.int32),
            axis) > 0
        return (img, sent_counts[None], overflow, pg.radius,
                pg.mask & (pg.radius > 0))

    rep = P()
    img, frag_counts, overflow, radii, vis = shard_map(
        worker, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), rep, rep, rep),
        out_specs=(P(None, axis, None), P(axis, None), rep, P(axis),
                   P(axis)),
        check_vma=False,
    )(means3d, scales, rotq, opacity, shs, alive, mean2d_grad_hook,
      camera, bg, active_sh_degree)
    return {"render": img[:, :height, :],
            "overflowed": overflow,
            "frag_counts": frag_counts,
            "radii": radii,
            "visibility_filter": vis}
