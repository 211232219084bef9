"""Tile binning for the splatting rasterizer, pure XLA ops.

TPU-native replacement for the CUDA rasterizer's atomics-based
duplicate-and-radix-sort binning, built from XLA-friendly primitives:

  1. instance expansion with a STATIC budget, gather-free: per-Gaussian
     run markers scattered at run starts + cummax flood fill (budget-
     sized 1D gathers lower to ~2ms element-granularity gathers on TPU);
  2. ONE sort on a packed int32 (tile, depth-rank) key;
  3. re-layout into ALIGN(=128)-aligned per-tile segments (the Pallas
     blend DMA-streams whole chunks from provably aligned offsets, and
     aligned segments make backward grad writes overlap-free), again via
     scatter + cummax (the alignment shift is non-decreasing).

Everything is static-shaped: it jits once and never recompiles as the
live Gaussian set evolves. TILE=16 is the XLA-backend default; the
Pallas backend uses 32 (fewer duplicated instances).
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


def pltpu_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> order-preserving int32 bits (lets float depth ride the
    combined int32 gather batch): flip negative values' magnitude."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b < 0, jnp.int32(-2147483648) - b - 1, b)


def sortable_bits_to_f32(b: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.where(b < 0, jnp.int32(-2147483648) - b - 1, b)
    return jax.lax.bitcast_convert_type(inv, jnp.float32)


class TileBins(NamedTuple):
    # Sorted, segment-ALIGNED Gaussian instance list + per-tile ranges.
    # Tile t owns slots [starts[t], starts[t] + roundup(count_t, ALIGN));
    # the first count_t = ends[t]-starts[t] are valid, the rest padding
    # (gauss_id 0, masked by count everywhere).
    gauss_id: jnp.ndarray   # (I_align,) int32 index into Gaussian arrays
    starts: jnp.ndarray     # (T,) int32 ALIGN-multiple segment start
    ends: jnp.ndarray       # (T,) int32 starts + valid count
    n_instances: jnp.ndarray  # () int32 total valid instances (may exceed
    #                            the budget if overflowed)
    aligned_total: jnp.ndarray  # () int32 end of the last written segment
    overflowed: jnp.ndarray   # () bool: instance budget exceeded
    n_slots: jnp.ndarray | None = None  # () int32 SLOT demand: instances
    #   + per-tile alignment padding. This (not n_instances) is what a
    #   budget must cover; the trainer's auto-grow sizes from it.


def tile_wh(tile) -> tuple[int, int]:
    """Normalize a tile spec to (tile_w, tile_h).

    Tiles may be RECTANGULAR: an int means square; a (w, h) pair sets
    each axis. Rectangular tiles matter for the Pallas blend: the
    per-chunk vector work scales with P = w*h while the instance
    duplication only grows with the shrunken axis, so 32x16 does about
    half the (pixel, instance) pair work of 32x32 for ~15% more
    instances (the dominant term on non-saturating scenes)."""
    if isinstance(tile, int):
        return tile, tile
    tw, th = tile
    return int(tw), int(th)


def tile_grid(width: int, height: int, tile=TILE) -> tuple[int, int]:
    tw, th = tile_wh(tile)
    return (-(-width // tw), -(-height // th))


def tile_spans(pg: ProjectedGaussians, width: int, height: int,
               tile: int = TILE, tight: bool = True):
    """Per-Gaussian covered tile rectangle [tx0, tx1) x [ty0, ty1).

    tight=True (default) uses per-axis ellipse extents instead of the
    CUDA rasterizer's bounding square of the 3-sigma disk: the blend
    keeps a pixel only while alpha = op*exp(-q) >= 1/255 (oracle.
    gaussian_alpha), and the level set {q <= L}, L = log(op*255), has
    |dx| <= sqrt(2 L cov_xx) with cov = conic^-1 (and symmetrically in
    y). Every pixel outside the min(ellipse-extent, radius) box is
    provably zeroed by the blend's own cutoffs, so shrinking the span
    leaves image and gradients unchanged while cutting the instance
    count (and therefore sort/pack/blend work and the required budget)
    — typically 2-4x for anisotropic splats. Gaussians with op < 1/255
    are invisible outright (max alpha < cutoff) and get a zero span.
    """
    nx, ny = tile_grid(width, height, tile)
    tw, th = tile_wh(tile)
    mxr, myr, ca, cb, cc, opr, r = _pg_rows(pg)
    mask = pg.mask
    if tight:
        det = ca * cc - cb * cb
        pd = (ca > 0.0) & (cc > 0.0) & (det > 0.0)
        safe_det = jnp.where(pd, det, 1.0)
        L = jnp.log(jnp.maximum(opr, 1e-12) * 255.0)
        # 1.0001 + 1e-3: fp-safety margin; the pixel grid is integer and
        # tiles are 16-32 px, so a ~0.001 px slack never adds a tile but
        # guards the sqrt/log rounding against culling a live pixel.
        ext = lambda cov_ii: jnp.sqrt(jnp.maximum(2.0 * L, 0.0)
                                      * cov_ii) * 1.0001 + 1e-3
        rx = jnp.minimum(jnp.where(pd, ext(cc / safe_det), r), r)
        ry = jnp.minimum(jnp.where(pd, ext(ca / safe_det), r), r)
        mask = mask & (opr >= MIN_ALPHA)
    else:
        rx = ry = r
    # floor (not int32 trunc-toward-zero): band-sharded rendering feeds
    # NEGATIVE band-local coordinates through here, and trunc would make
    # a Gaussian ending within `tile` px above the band spuriously cover
    # its first row — harmless alpha-wise (radius-cutoff zeroes it) but
    # it perturbs tile_cap truncation vs the full-grid binning.
    tx0 = jnp.clip(jnp.floor((mxr - rx) / tw).astype(jnp.int32), 0, nx)
    ty0 = jnp.clip(jnp.floor((myr - ry) / th).astype(jnp.int32), 0, ny)
    tx1 = jnp.clip(jnp.floor((mxr + rx) / tw).astype(jnp.int32) + 1,
                   0, nx)
    ty1 = jnp.clip(jnp.floor((myr + ry) / th).astype(jnp.int32) + 1,
                   0, ny)
    w = jnp.where(mask, tx1 - tx0, 0)
    h = jnp.where(mask, ty1 - ty0, 0)
    return tx0, ty0, w, h, nx, ny


MIN_ALPHA = 1.0 / 255.0   # == oracle.MIN_ALPHA (import cycle avoided)


def _pg_rows(pg: ProjectedGaussians):
    """(mx, my, ca, cb, cc, op, rad) as (N,) rows.

    Reads the feature-major pg.feat cache when present (free row
    slices); otherwise extracts columns from the (N, k) fields — each
    such extract is a lane<->sublane relayout on TPU, which is why
    project_gaussians emits the cache. NOTE: pg.feat row 3 is the
    MASKED opacity; the span/cull math only reads opacity where
    pg.mask holds, so the two paths agree.
    """
    if pg.feat is not None:
        f = pg.feat
        return f[4], f[5], f[6], f[7], f[8], f[3], f[9]
    return (pg.mean2d[:, 0], pg.mean2d[:, 1], pg.conic[:, 0],
            pg.conic[:, 1], pg.conic[:, 2], pg.opacity, pg.radius)


def _tight_cull_keep(cols, tx, ty, tile):
    """Per-INSTANCE tight culling: drop (Gaussian, tile) pairs whose
    contribution is provably zero at every pixel center of the tile.

    The CUDA rasterizer bins by the axis-aligned bounding square of the
    3-sigma radius (gs_renderer call-site spec); for anisotropic splats
    and corner tiles most of those instances never pass the blend's keep
    test (alpha >= 1/255 and dist <= radius, oracle.gaussian_alpha). Two
    conservative tests, both exact (an instance is culled only if its
    alpha is zero at EVERY pixel center, so image and gradients are
    mathematically unchanged; the pallas backend shifts by its own
    ~1e-5 split-matmul noise floor as chunk boundaries move):

      disk    closest point of the tile's pixel-center rect to the mean
              farther than `radius` => the radius cutoff zeroes every
              pixel.
      ellipse max alpha over the rect = op * exp(-min_q) with min_q the
              rect-constrained minimum of the conic quadratic
              q = .5(a dx^2 + c dy^2) + b dxdy (clamped unconstrained
              1-D minimizers per edge); max alpha < 1/255 => the alpha
              cutoff zeroes every pixel. Applied only where the conic is
              positive-definite (else keep).

    cols: the gathered (12, I) per-instance table (see bin_gaussians).
    Returns (I,) bool keep mask.
    """
    fb = lambda r: jax.lax.bitcast_convert_type(cols[r], jnp.float32)
    mx, my = fb(5), fb(6)
    ca, cb, cc = fb(7), fb(8), fb(9)
    op, rad = fb(10), fb(11)

    tw, th = tile_wh(tile)
    x0 = (tx * tw).astype(jnp.float32)
    y0 = (ty * th).astype(jnp.float32)
    x1 = x0 + (tw - 1)                       # pixel CENTERS are integers
    y1 = y0 + (th - 1)

    ddx = jnp.clip(mx, x0, x1) - mx
    ddy = jnp.clip(my, y0, y1) - my
    disk_ok = ddx * ddx + ddy * ddy <= rad * rad

    # rect-constrained minimum of q over [lx,hx] x [ly,hy] (mean-rel.)
    lx, hx = x0 - mx, x1 - mx
    ly, hy = y0 - my, y1 - my
    inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    safe_ca = jnp.where(ca > 0, ca, 1.0)
    safe_cc = jnp.where(cc > 0, cc, 1.0)

    def edge_v(dx):                          # vertical edge, fixed dx
        dy = jnp.clip(-cb * dx / safe_cc, ly, hy)
        return q(dx, dy)

    def edge_h(dy):                          # horizontal edge, fixed dy
        dx = jnp.clip(-cb * dy / safe_ca, lx, hx)
        return q(dx, dy)

    min_q = jnp.minimum(jnp.minimum(edge_v(lx), edge_v(hx)),
                        jnp.minimum(edge_h(ly), edge_h(hy)))
    min_q = jnp.where(inside, 0.0, jnp.maximum(min_q, 0.0))
    pd = (ca > 0) & (cc > 0) & (ca * cc - cb * cb >= 0)
    # margin 0.999: never cull a borderline-visible instance to fp noise
    ellipse_dead = pd & (op * jnp.exp(-min_q) < MIN_ALPHA * 0.999)
    return disk_ok & ~ellipse_dead


def bin_gaussians(pg: ProjectedGaussians, width: int, height: int,
                  budget: int, tile: int = TILE,
                  tight_cull: bool = True, align: int = ALIGN) -> TileBins:
    """Build the depth-sorted per-tile instance lists.

    budget: STATIC total slot capacity I (instances + per-tile alignment
    padding). If the demand exceeds it, later instances (by Gaussian
    index) are dropped and `overflowed` is set — callers size the budget
    so this never happens in steady state (n_slots reports the demand;
    the trainer auto-grows from it).
    tight_cull: tight per-axis ellipse spans (tile_spans tight=True)
    plus per-instance tile-rect culling (_tight_cull_keep); False keeps
    the raw bounding-square expansion (A/B hook for tests/benchmarks).
    align: per-tile segment alignment. The Pallas blend needs ALIGN(=128)
    segments (provably lane-aligned DMA offsets + overlap-free backward
    writes); the XLA tiled backend and the Gaussian-shard fragment
    exchange work on the dense layout — pass align=1 there and the
    budget carries zero padding waste.
    """
    n = pg.mean2d.shape[0]
    tx0, ty0, w, h, nx, ny = tile_spans(pg, width, height, tile,
                                        tight=tight_cull)
    num_tiles = nx * ny
    counts = (w * h).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts          # exclusive
    total = offsets[-1] + counts[-1] if n else jnp.int32(0)

    slot = jnp.arange(budget, dtype=jnp.int32)
    valid = slot < total

    # Instance expansion WITHOUT per-instance gathers (profiled at ~2ms
    # each on TPU): scatter per-Gaussian run markers at each run start
    # (50k cheap updates) and flood-fill with cummax — both `gid` and the
    # run-start offsets are non-decreasing along the instance axis.
    g_idx = jnp.arange(n, dtype=jnp.int32)
    safe_offs = jnp.where(counts > 0, offsets, budget)
    marks_g = jnp.zeros(budget, jnp.int32).at[safe_offs].max(
        g_idx + 1, mode="drop")
    gid = jax.lax.cummax(marks_g) - 1                     # (I,)
    marks_o = jnp.zeros(budget, jnp.int32).at[safe_offs].max(
        offsets, mode="drop")
    run_start = jax.lax.cummax(marks_o)
    rank = slot - run_start

    single_key = n * (num_tiles + 1) < 2 ** 31
    if single_key:
        order = jnp.argsort(pg.depth)
        depth_rank = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
    else:
        depth_rank = jnp.zeros(n, jnp.int32)

    # ONE combined column gather for the remaining per-Gaussian data
    # (vector-layout (I, k) gathers are ~10x cheaper than k separate
    # element-granularity 1D gathers; TPU gathers are index-bound, so
    # extra rows ride along ~free). f32 rows ride the int32 batch via
    # raw bitcasts (rows 5..11 feed the tight-cull test below).
    fbits = jax.lax.bitcast_convert_type
    mxr, myr, car, cbr, ccr, opr, radr = _pg_rows(pg)
    per_g = jnp.stack([jnp.maximum(w, 1), tx0, ty0, depth_rank,
                       pltpu_bits(pg.depth),
                       fbits(mxr, jnp.int32),
                       fbits(myr, jnp.int32),
                       fbits(car, jnp.int32),
                       fbits(cbr, jnp.int32),
                       fbits(ccr, jnp.int32),
                       fbits(opr, jnp.int32),
                       fbits(radr, jnp.int32)], axis=0)  # (12, N)
    cols = per_g[:, jnp.maximum(gid, 0)]                  # (12, I)
    gw = cols[0]
    tx = cols[1] + rank % gw
    ty = cols[2] + rank // gw
    keep = valid & (gid >= 0)
    if tight_cull:
        keep &= _tight_cull_keep(cols, tx, ty, tile)
    tile_ids = jnp.where(keep, ty * nx + tx, num_tiles).astype(jnp.int32)
    depth_rank_i = cols[3]
    gid = jnp.maximum(gid, 0)

    # Sort instances into (tile, depth) order. When tile*n fits int32,
    # instances sort once on the packed int32 (tile, depth-rank) key —
    # ~2x faster than a 2-key 3-operand sort.
    if single_key:
        key = tile_ids * jnp.int32(n) + depth_rank_i
        key_sorted, gid_sorted = jax.lax.sort((key, gid), num_keys=1)
        tile_sorted = key_sorted // jnp.int32(n)
    else:
        depth = sortable_bits_to_f32(cols[4])
        tile_sorted, _, gid_sorted = jax.lax.sort(
            (tile_ids, depth, gid), num_keys=2)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    raw_starts = jnp.searchsorted(tile_sorted, tids,
                                  side='left').astype(jnp.int32)
    raw_ends = jnp.searchsorted(tile_sorted, tids,
                                side='right').astype(jnp.int32)

    # re-layout into ALIGN-aligned per-tile segments. delta (the shift of
    # a tile's run) is the accumulated alignment waste — NON-DECREASING —
    # so it flood-fills over the instance axis with scatter+cummax
    # instead of a per-instance table gather.
    counts = raw_ends - raw_starts
    seg = ((counts + align - 1) // align) * align
    astarts = (jnp.cumsum(seg) - seg).astype(jnp.int32)
    # Alignment waste lives INSIDE the budget: i_align is the budget
    # rounded up to ALIGN, NOT budget + ALIGN*T worst-case slack. TPU
    # gathers/scatters are INDEX-bound (~7ns/slot regardless of bytes),
    # so the old static slack cost ~0.9 ms/step of pure padding tax in
    # the downstream instance pack at bench scale (64k phantom slots
    # through one gather fwd + one scatter-add bwd). A scene whose
    # aligned layout exceeds the budget sets `overflowed` exactly like
    # an instance-count overflow, and callers grow-and-retry; `n_slots`
    # reports the demand so the growth lands right the first time.
    i_align = -(-budget // align) * align
    aligned_need = astarts[-1] + seg[-1]        # sum of per-tile segments
    delta = astarts - raw_starts                # (T,) >= 0, non-decreasing
    mark_pos = jnp.where(counts > 0, raw_starts, budget)
    dmarks = jnp.zeros(budget, jnp.int32).at[mark_pos].max(
        delta, mode="drop")
    newpos = jnp.arange(budget, dtype=jnp.int32) + jax.lax.cummax(dmarks)
    newpos = jnp.where(tile_sorted < num_tiles, newpos, i_align)
    gauss_al = jnp.zeros(i_align, jnp.int32).at[newpos].set(
        gid_sorted, mode="drop")

    # n_slots: true instance count plus alignment waste measured on the
    # KEPT part (instances dropped by an instance-count overflow carry
    # unknown extra waste — lower bound; the grow-and-retry loop's 1.5x
    # headroom absorbs it).
    n_slots = total + (aligned_need - jnp.sum(counts))
    # Clamp the per-tile tables so downstream kernels stay in-bounds even
    # on an overflowed (to-be-retried) frame: starts/ends within
    # [0, i_align], and roundup(ends-starts, ALIGN) never crosses the
    # array end (all quantities are ALIGN-multiples or clamped to one).
    starts_c = jnp.minimum(astarts, i_align)
    ends_c = jnp.minimum(astarts + counts, i_align)
    return TileBins(gauss_id=gauss_al, starts=starts_c,
                    ends=ends_c, n_instances=total,
                    aligned_total=jnp.minimum(aligned_need, i_align),
                    overflowed=(total > budget) | (aligned_need > i_align),
                    n_slots=n_slots)
