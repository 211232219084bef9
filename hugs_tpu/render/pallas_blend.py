"""Pallas TPU kernels for the per-tile splat blend (fwd + custom VJP).

This is the hot op of the framework — the TPU-native counterpart of the
CUDA rasterizer's renderCUDA/renderBackwardCUDA (the behavior spec is the
call site hugs/renderer/gs_renderer.py:141-152), designed for the MXU/VPU
rather than translated:

  layout    pixels-in-sublanes (tile*tile; 1024 at the default 32px
            tile), instances-in-lanes (chunks of 128). Zero in-kernel
            transposes — (P,1)<->(1,P) lifts ride tiny MXU outer
            products instead of relayouts.
  prefix    front-to-back transmittance via log-space prefix sums
            computed as triangular-ones MATMULs on the MXU
            (cumsum-as-matmul), not a sequential per-pixel loop. The
            triangular operand is 0/1-valued (exact in bf16), so the
            product is computed as hi@M + lo@M with x = hi + lo split
            into two bf16 halves: full-f32 accuracy at 2 MXU passes
            instead of HIGHEST's 6.
  stream    each grid cell owns TPC=8 consecutive tiles; their aligned
            instance segments (tiles.bin_gaussians) form one contiguous
            chunk list that is DMA-streamed HBM->VMEM double-buffered
            across tile boundaries. Tiles with few instances cost
            proportionally little (the XLA fallback pads every tile to
            capacity).
  early-out the blend semantics carry the CUDA rasterizer's T<1e-4
            early termination as a per-instance [T_i >= T_EPS]
            indicator (oracle.py docstring). The forward walks each
            subtile's chunk stream front-to-back and STOPS as soon as
            every pixel is saturated (max log T < log T_EPS): remaining
            chunks provably contribute exactly 0. The number of chunks
            actually processed per subtile is emitted as a second
            (SMEM) output; the backward walks only those.
  backward  CUDA-style recompute: only the per-pixel final log-
            transmittance is saved; the bwd kernel re-evaluates alphas
            chunk-by-chunk in reverse, reconstructing T_i = exp(logT_fin
            - suffix_i) and emitting per-instance grads — no (K, P)
            residuals ever hit HBM.

Instance data is pre-gathered by XLA into a feature-major (16, I) array
(rows: r, g, b, opacity, mx, my, conic a/b/c, radius, pad...); the
backward's per-instance grads scatter-add back to per-Gaussian arrays via
XLA segment ops. Blending semantics (alpha clamp 0.99, 1/255 cutoff,
radius cutoff, T_EPS=1e-4 early termination) are identical to
render/oracle.py — all three backends agree to fp tolerance.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hugs_tpu.render.oracle import MIN_ALPHA, MAX_ALPHA, LOG_TEPS
from hugs_tpu.render.project import ProjectedGaussians
from hugs_tpu.render.tiles import TileBins, TILE, tile_grid

CHUNK = 128
N_FEAT = 16

# --- MXU alpha-quadratic mode ------------------------------------------
# Evaluate the per-(pixel, instance) Gaussian exponent as ONE basis
# matmul instead of ~7 (P, CHUNK) VPU passes: power(u, v) is a degree-2
# polynomial in the pixel coords, so power = basis^T @ coef with basis
# rows [1, u', v', u'^2, v'^2, u'v'] over tile-local pixel coords
# RECENTERED to a per-instance grid point (spacing _GRID_SP), and coef a
# per-instance 6-vector of conic/mean algebra ((1, CHUNK) row math).
# Recentering bounds the cancellation between the matmul's partial sums:
# with spacing 8 the basis terms at any pixel that can still pass the
# 1/255 alpha cutoff are <= ~150, so the f32-accumulation error in power
# is ~1e-5 worst-case (vs the exact-VPU path's 0) — the same order as
# the CUDA rasterizer's own fast-math exp/fmaf error vs an f64 oracle.
# The basis is EXACT as a 2-term bf16 split (integer entries < 2^10);
# the f32 coefficients use a 3-term split; the bl@c3 cross term (~2^-27
# relative) is dropped -> 5 MXU passes, K = 6 * (tw/8) * (th/8).
# The radius cutoff stays on the VPU (exact oracle tie behavior), and
# the vestigial `power <= 0` guard (true power is <= 0 for the
# blur-floored PD conic; the oracle keeps power == +0.0 too) widens to
# `power <= _POW_EPS` so matmul noise at near-mean pixels cannot drop a
# full-opacity contribution.
#
# MEASURED (v5e, 50k gauss @ 960x540 bench, same chip minutes apart):
# 25.3 Mpx/s with the matmul vs 27.2 Mpx/s exact-VPU — a ~7% LOSS.
# The 5 K<=128 MXU passes + the serial power->exp dependency (the MXU
# result must land before the VPU's exp can start, and Mosaic does not
# software-pipeline across the chunk walk's DMA waits) cost more than
# the ~6 (P, CHUNK) VPU passes they remove. Default OFF; kept (with
# both-mode parity tests) as the measured closure of the last
# single-chip lever from ROUND_NOTES — the blend really is at the v5e
# VPU roofline in this formulation.
#
# OUT-OF-TILE CAVEAT: gx/gy are clipped to the tile's recenter grid, so
# an instance whose mean lies OUTSIDE the tile (a large splat spilling
# over from a neighbor) keeps a recenter residual rx/ry of up to the
# cull radius, not <= _GRID_SP/2. The ~1e-5 worst-case power error
# assumes recentered terms <= ~150; for far-out-of-tile, strongly
# anisotropic splats the a0/bu partial-sum cancellation can exceed that
# bound despite the 3-term coef split. Acceptable for the shipped
# default-off mode (the alpha cutoff kills most such pixels anyway);
# extending the grid one spacing beyond each tile edge would restore
# the bound at +~50% K if the mode is ever promoted.
_GRID_SP = 8
_POW_EPS = 1e-4
POWER_MXU = os.environ.get("HUGS_POWER_MXU", "0") != "0"


def _grid_dims(tile):
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    if tw % _GRID_SP or th % _GRID_SP:
        return None
    return tw // _GRID_SP, th // _GRID_SP


def _grid_basis(tile):
    """Recentered quadratic pixel basis, (K, P) bf16 hi/lo pair.

    Row 6*g + s, for grid point g = gy * ngx + gx at tile-local center
    (8*gx + 4, 8*gy + 4), holds basis s of [1, u', v', u'^2, v'^2,
    u'v'] with u' = u - cx (v' likewise) over the tile's row-major
    pixels. Every entry is an integer of magnitude < 2^10, so hi + lo
    reconstructs it EXACTLY (two 8-bit-mantissa terms cover 16 bits).
    Loop-invariant: built once per kernel invocation.
    """
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    ngx, ngy = _grid_dims(tile)
    P = tw * th
    K = -(-6 * ngx * ngy // 32) * 32     # pad rows to the bf16 sublane tile
    r = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0)
    p = jax.lax.broadcasted_iota(jnp.int32, (K, P), 1)
    g = r // 6
    sub = r - 6 * g
    gx = g % ngx
    gy = g // ngx
    u = ((p % tw) - (gx * _GRID_SP + _GRID_SP // 2)).astype(jnp.float32)
    v = ((p // tw) - (gy * _GRID_SP + _GRID_SP // 2)).astype(jnp.float32)
    val = jnp.where(sub == 0, 1.0,
          jnp.where(sub == 1, u,
          jnp.where(sub == 2, v,
          jnp.where(sub == 3, u * u,
          jnp.where(sub == 4, v * v, u * v)))))
    val = jnp.where(g < ngx * ngy, val, 0.0)
    hi = val.astype(jnp.bfloat16)
    lo = (val - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _power_mxu(chunk, basis, tx0, ty0, tile):
    """Gaussian exponent (P, CHUNK) via the recentered basis matmul."""
    bh, bl = basis
    ngx, ngy = _grid_dims(tile)
    K = bh.shape[0]
    mx = chunk[F_MX, :][None, :]
    my = chunk[F_MY, :][None, :]
    ca = chunk[F_CA, :][None, :]
    cb = chunk[F_CB, :][None, :]
    cc = chunk[F_CC, :][None, :]
    mxl = mx - tx0                                  # tile-local mean
    myl = my - ty0
    gx = jnp.clip(jnp.floor(mxl * (1.0 / _GRID_SP)), 0, ngx - 1)
    gy = jnp.clip(jnp.floor(myl * (1.0 / _GRID_SP)), 0, ngy - 1)
    gi = (gy * ngx + gx).astype(jnp.int32)          # (1, CHUNK)
    rx = mxl - (gx * _GRID_SP + _GRID_SP // 2)      # mean - grid point
    ry = myl - (gy * _GRID_SP + _GRID_SP // 2)
    # power(u', v') = -0.5 ca (rx-u')^2 - 0.5 cc (ry-v')^2
    #                 - cb (rx-u')(ry-v'), expanded in the basis
    a0 = -0.5 * (ca * rx * rx + cc * ry * ry) - cb * rx * ry
    bu = ca * rx + cb * ry
    bv = cc * ry + cb * rx
    r = jax.lax.broadcasted_iota(jnp.int32, (K, CHUNK), 0)
    g = r // 6
    sub = r - 6 * g
    cof = jnp.where(sub == 0, a0,
          jnp.where(sub == 1, bu,
          jnp.where(sub == 2, bv,
          jnp.where(sub == 3, -0.5 * ca,
          jnp.where(sub == 4, -0.5 * cc, -cb)))))
    cof = jnp.where(g == gi, cof, 0.0)              # (K, CHUNK)
    c1 = cof.astype(jnp.bfloat16)
    rem = cof - c1.astype(jnp.float32)
    c2 = rem.astype(jnp.bfloat16)
    c3 = (rem - c2.astype(jnp.float32)).astype(jnp.bfloat16)
    dd = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (dd(bh, c1) + dd(bh, c2) + dd(bh, c3)
            + dd(bl, c1) + dd(bl, c2))              # (P, CHUNK)
# feature row indices: rgb FIRST so the fwd color matmul can take the
# 8-sublane-aligned chunk[0:8] slice directly
F_R, F_G, F_B, F_OP, F_MX, F_MY, F_CA, F_CB, F_CC, F_RAD = range(10)

_LOG_EPS = -87.0  # exp(-87) ~ 1e-38: "fully opaque" clamp in log space


def _tri_excl(n=CHUNK):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r < c).astype(jnp.float32)


def _suf_excl(n=CHUNK):
    """strictly-upper for suffix-exclusive sums along lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r > c).astype(jnp.float32)


def _split_mm(x, m):
    """x @ m at full f32 accuracy in 2 MXU passes.

    m must be EXACTLY representable in bf16 (here: 0/1 triangular masks).
    Split x = hi + lo (hi = bf16 round of x, lo the f32 remainder, itself
    bf16-representable to 2^-18 relative); then hi@m + lo@m equals the
    HIGHEST-precision product to ~f32 roundoff at 1/3 the MXU passes.
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    out = jnp.dot(hi, mb, preferred_element_type=jnp.float32)
    return out + jnp.dot(lo, mb, preferred_element_type=jnp.float32)


def _split_mm3(x, y, dims):
    """dot_general(x, y, dims) at ~f32 accuracy in 3 bf16 MXU passes.

    Both operands hi/lo-split; the dropped lo@lo term is <= 2^-18
    relative. Replaces Precision.HIGHEST (6 passes) on the kernels'
    small-K / narrow-output matmuls, whose cost is pass-count-dominated
    (measured 1.4us/chunk at HIGHEST — the single largest fixed cost of
    the backward walk)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yh = y.astype(jnp.bfloat16)
    yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    return d(xh, yh) + d(xh, yl) + d(xl, yh)


def _tile_pixels(t, nx, tile):
    """Pixel-center coords of tile t as (P, 1) sublane vectors.

    tile may be rectangular (tw, th); pixels are laid out row-major
    within the tile (x fastest)."""
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    P = tw * th
    ty = t // nx
    tx = t - ty * nx
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * tw + lin % tw).astype(jnp.float32)
    py = (ty * th + lin // tw).astype(jnp.float32)
    return px, py


def _moment_basis(tile):
    """(8, P) bf16 moment basis over tile-LOCAL pixel coords: rows
    [1, u, v, u^2, v^2, uv, 0, 0] with u = px%tile - tile//2 (and v in
    y). Centering keeps |u| <= tile/2, so u^2 <= (tile/2)^2 <= 256 at
    tile=32 and every entry is EXACTLY representable in bf16 — the
    moment matmul's only rounding comes from splitting the f32 operand.
    Loop-invariant (subtile-independent): hoisted out of the chunk walk.
    """
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    P = tw * th
    r = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    p = jax.lax.broadcasted_iota(jnp.int32, (8, P), 1)
    u = (p % tw - tw // 2).astype(jnp.float32)
    v = (p // tw - th // 2).astype(jnp.float32)
    b = jnp.where(r == 0, 1.0,
        jnp.where(r == 1, u,
        jnp.where(r == 2, v,
        jnp.where(r == 3, u * u,
        jnp.where(r == 4, v * v,
        jnp.where(r == 5, u * v, 0.0))))))
    return b.astype(jnp.bfloat16)


def _chunk_alpha(chunk, valid, px, py, basis=None, tx0=None, ty0=None,
                 tile=None):
    """alpha (P, CHUNK) for one instance chunk.

    chunk: (N_FEAT, CHUNK) feature rows; valid: (1, CHUNK) mask;
    px, py: (P, 1). Exactly the oracle's gaussian_alpha semantics.
    With `basis` (POWER_MXU mode) the exponent rides the recentered
    basis matmul; the radius cutoff and the alpha/255 cutoff keep their
    exact-VPU forms either way (oracle tie behavior for the radius, and
    the exp damps the ~1e-5 matmul noise everywhere it could matter —
    see the POWER_MXU block comment).
    """
    mx = chunk[F_MX, :][None, :]
    my = chunk[F_MY, :][None, :]
    op = chunk[F_OP, :][None, :]
    rad = chunk[F_RAD, :][None, :]

    dx = mx - px                        # (P, CHUNK)
    dy = my - py
    dist2 = dx * dx + dy * dy
    if basis is None:
        ca = chunk[F_CA, :][None, :]
        cb = chunk[F_CB, :][None, :]
        cc = chunk[F_CC, :][None, :]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * (dx * dy)
        pow_ok = power <= 0.0
    else:
        power = _power_mxu(chunk, basis, tx0, ty0, tile)
        pow_ok = power <= _POW_EPS
    alpha = jnp.minimum(MAX_ALPHA, op * jnp.exp(jnp.minimum(power, 0.0)))
    keep = pow_ok & (alpha >= MIN_ALPHA) \
        & (dist2 <= rad * rad) & (valid > 0)
    return jnp.where(keep, alpha, 0.0)


TPC = 8  # tiles (subtiles) per grid cell — amortizes per-cell pipeline
#          overhead and keeps the DMA stream continuous across tiles


def _cell_tables(starts_ref, counts_ref, t0, tpc):
    """Unrolled per-subtile scalar tables for one cell: chunk counts and
    cumulative chunk offsets (all SMEM scalars)."""
    counts = [counts_ref[t0 + s] for s in range(tpc)]
    nch = [(c + CHUNK - 1) // CHUNK for c in counts]
    cum = [None] * tpc
    acc = nch[0] * 0
    for s in range(tpc):
        cum[s] = acc
        acc = acc + nch[s]
    starts = [starts_ref[t0 + s] for s in range(tpc)]
    return counts, nch, cum, acc  # acc == total chunks in cell


def _chunk_ctx(k, counts, nch, cum, starts, tpc):
    """Map a flat cell-chunk index k -> (subtile s, local chunk ci,
    DMA start address, subtile count, subtile chunk count), via
    unrolled scalar selects."""
    s = k * 0
    for i in range(1, tpc):
        s = jnp.where(k >= cum[i], i, s)
    def sel(tab):
        v = tab[0]
        for i in range(1, tpc):
            v = jnp.where(k >= cum[i], tab[i], v)
        return v
    ci = k - sel(cum)
    start = pl.multiple_of(sel(starts), CHUNK) + ci * CHUNK
    return s, ci, start, sel(counts), sel(nch)


_OOB_LOG = -100.0  # pre-saturated init for out-of-image pixels: below
#                    LOG_TEPS, so padded tile rows/cols never block the
#                    saturation early-out and contribute exactly 0


def _fwd_kernel(starts_ref, counts_ref,          # scalar prefetch (SMEM)
                inst_hbm,                        # (N_FEAT, I) in HBM/ANY
                bg_ref,                          # (8, 1) VMEM (rows 3+ zero)
                out_ref,                         # (TPC, 8, P) block
                nch_out,                         # (T_pad,) whole-array SMEM:
                #                                  chunks done per subtile
                acc_ref, logt_ref, buf, sems,    # scratch
                *, nx, tile, tpc, width, height, power_mxu):
    c = pl.program_id(0)
    tw_, th_ = tile if isinstance(tile, tuple) else (tile, tile)
    P = tw_ * th_
    basis = _grid_basis(tile) if power_mxu else None
    t0 = c * tpc
    counts, nch, cum, total = _cell_tables(starts_ref, counts_ref, t0, tpc)
    starts = [starts_ref[t0 + i] for i in range(tpc)]

    # pre-fill every subtile with the empty-tile result (pure bg, logT=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
    bg_full = jnp.broadcast_to(bg_ref[:, :], (8, P))
    empty = jnp.where(row < 3, bg_full, 0.0)
    for s in range(tpc):
        out_ref[s, :, :] = empty
        nch_out[t0 + s] = 0

    def get_dma(slot, k):
        _, _, start, _, _ = _chunk_ctx(k, counts, nch, cum, starts, tpc)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(start, CHUNK)], buf.at[slot],
            sems.at[slot])

    @pl.when(total > 0)
    def _():
        get_dma(0, 0).start()

    # front-to-back walk over the cell's flattened chunk list. On
    # saturation (every pixel's log T < log T_EPS) the rest of the
    # subtile's stream contributes EXACTLY 0 (the [T_i >= T_EPS]
    # indicator) — jump straight to the next subtile's first chunk.
    def cond(state):
        k, _ = state
        return k < total

    def body(state):
        k, slot = state
        s, ci, _, count_s, nch_s = _chunk_ctx(k, counts, nch, cum, starts,
                                              tpc)
        have_next = (k + 1) < total

        @pl.when(have_next)
        def _():
            get_dma(1 - slot, k + 1).start()     # speculative prefetch

        get_dma(slot, k).wait()
        chunk = buf[slot]

        t = t0 + s
        px, py = _tile_pixels(t, nx, tile)
        ty_i = t // nx
        tx0 = ((t - ty_i * nx) * tw_).astype(jnp.float32)
        ty0 = (ty_i * th_).astype(jnp.float32)

        @pl.when(ci == 0)
        def _():
            acc_ref[...] = jnp.zeros((8, P), jnp.float32)
            # out-of-image pixels start saturated (see _OOB_LOG)
            inb = (px < width) & (py < height)
            logt_ref[...] = jnp.where(inb, 0.0, _OOB_LOG)

        color = acc_ref[...]
        log_t = logt_ref[...]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        valid = (lane < (count_s - ci * CHUNK)).astype(jnp.float32)

        alpha = _chunk_alpha(chunk, valid, px, py, basis, tx0, ty0, tile)
        la = jnp.log1p(-alpha)                        # (P, CHUNK)
        pre = _split_mm(la, _tri_excl()) + log_t
        trans = jnp.exp(jnp.maximum(pre, _LOG_EPS))
        w = alpha * trans * (pre >= LOG_TEPS)         # (P, CHUNK)
        color = color + _split_mm3(
            chunk[0:8, :], w, (((1,), (1,)), ((), ())))   # (8, P)
        log_t = log_t + jnp.sum(la, axis=1, keepdims=True)
        acc_ref[...] = color
        logt_ref[...] = log_t

        max_lt = jnp.max(log_t)                       # scalar
        is_last = ci == nch_s - 1
        sat = jnp.logical_and(max_lt < LOG_TEPS, jnp.logical_not(is_last))
        finish = jnp.logical_or(is_last, sat)

        @pl.when(finish)
        def _():
            ind = (log_t >= LOG_TEPS).astype(jnp.float32)
            t_fin = jnp.exp(jnp.maximum(log_t, _LOG_EPS)) * ind
            bg_term = jax.lax.dot_general(
                bg_ref[:, :], t_fin,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            logt8 = jax.lax.dot_general(
                jnp.ones((8, 1), jnp.float32), log_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            out_ref[pl.ds(s, 1), :, :] = jnp.where(
                row < 3, color + bg_term, logt8)[None]
            nch_out[t0 + s] = ci + 1

        # next chunk: sequential, or jump over the saturated remainder
        nxt_tab = cum[1:] + [total]                   # cum[s+1] table
        nxt = nxt_tab[0]
        for i in range(1, tpc):
            nxt = jnp.where(s == i, nxt_tab[i], nxt)
        knext = jnp.where(sat, nxt, k + 1)

        # on a jump the speculative prefetch targeted the wrong chunk:
        # drain it, then start the right one into the same slot
        @pl.when(sat)
        def _():
            @pl.when(have_next)
            def _():
                get_dma(1 - slot, k + 1).wait()

            @pl.when(knext < total)
            def _():
                get_dma(1 - slot, knext).start()

        return knext, 1 - slot

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _bwd_kernel(starts_ref, counts_ref,          # counts are EFFECTIVE:
                #                                  min(count, done*CHUNK)
                inst_hbm,                        # (N_FEAT, I)
                bg_ref,                          # (8, 1) (rows 3+ zero)
                fout_ref,                        # (TPC, 8, P): fwd output
                gout_ref,                        # (TPC, 8, P): dL/dout
                ginst_hbm,                       # (N_FEAT, I) output in HBM
                buf, gbuf, sems, gsems,
                g_scr, ltf_scr, sufs0_scr,
                *, nx, tile, tpc, power_mxu):
    c = pl.program_id(0)
    tw_, th_ = tile if isinstance(tile, tuple) else (tile, tile)
    P = tw_ * th_
    basis = _grid_basis(tile) if power_mxu else None
    t0 = c * tpc
    counts, nch, cum, total = _cell_tables(starts_ref, counts_ref, t0, tpc)
    starts = [starts_ref[t0 + i] for i in range(tpc)]
    ones11 = jnp.ones((1, 1), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)

    def row_to_col(r):                                # (1, P) -> (P, 1)
        return jax.lax.dot_general(
            r, ones11, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def get_dma(slot, k):
        _, _, start, _, _ = _chunk_ctx(k, counts, nch, cum, starts, tpc)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(start, CHUNK)], buf.at[slot],
            sems.at[slot])

    def put_dma(slot, k):
        _, _, start, _, _ = _chunk_ctx(k, counts, nch, cum, starts, tpc)
        return pltpu.make_async_copy(
            gbuf.at[slot], ginst_hbm.at[:, pl.ds(start, CHUNK)],
            gsems.at[slot])

    NB = 4  # DMA pipeline depth: the reverse walk is linear (no
    #         saturation jumps), so gets prefetch 3 chunks ahead and puts
    #         drain 4 behind — per-chunk DMA latency fully hidden
    for d in range(NB - 1):
        @pl.when(total > d)
        def _(d=d):
            get_dma(d, total - 1 - d).start()

    # reverse walk over the cell's flattened PROCESSED-chunk list (counts
    # were shortened to what the forward actually blended before
    # saturation); carries reset at subtile boundaries (first visit of a
    # subtile is its LAST processed chunk). logT_fin (fwd row 3) is the
    # sum over exactly these chunks, so T_i reconstruction stays exact.
    def body(i, carry):
        k = total - 1 - i
        suf_log, suf_s = carry
        slot = i % NB

        @pl.when(i + (NB - 1) < total)
        def _():
            get_dma((i + NB - 1) % NB, k - (NB - 1)).start()

        get_dma(slot, k).wait()
        chunk = buf[slot]

        s, ci, _, count_s, nch_s = _chunk_ctx(k, counts, nch, cum, starts,
                                              tpc)
        first_visit = (ci == nch_s - 1)

        # per-SUBTILE quantities (pixel grads, saved final logT, bg
        # suffix seed) are hoisted into scratch on the subtile's first
        # visit: the dynamic (8, P) VMEM slices, the (P, 1) lift matmuls
        # and the exp run once per subtile, not once per chunk (the
        # per-chunk fixed costs — tiny matmuls, dynamic slices, DMA
        # waits — dominate this kernel, not the (P, CHUNK) vector math).
        @pl.when(first_visit)
        def _():
            g0 = gout_ref[pl.ds(s, 1), :, :][0]       # (8, P)
            g0 = jnp.where(row < 3, g0, 0.0)
            g_scr[...] = g0
            fout = fout_ref[pl.ds(s, 1), :, :][0]
            logt_row = jnp.sum(jnp.where(row == 3, fout, 0.0), axis=0,
                               keepdims=True)         # (1, P)
            ltf = row_to_col(logt_row)                # (P, 1)
            ltf_scr[...] = ltf
            # bg weight carries the [T_fin >= T_EPS] indicator (oracle.py)
            t_fin = jnp.exp(jnp.maximum(ltf, _LOG_EPS)) \
                * (ltf >= LOG_TEPS)
            g_bg = row_to_col(jnp.sum(g0 * bg_ref[:, :], axis=0,
                                      keepdims=True))
            sufs0_scr[...] = g_bg * t_fin

        g = g_scr[...]
        log_t_fin = ltf_scr[...]
        suf_log = jnp.where(first_visit, 0.0, suf_log)
        suf_s = jnp.where(first_visit, sufs0_scr[...], suf_s)

        t = t0 + s
        px, py = _tile_pixels(t, nx, tile)
        ty_i = t // nx
        tx0 = ((t - ty_i * nx) * tw_).astype(jnp.float32)
        ty0 = (ty_i * th_).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        valid = (lane < (count_s - ci * CHUNK)).astype(jnp.float32)

        alpha = _chunk_alpha(chunk, valid, px, py, basis, tx0, ty0, tile)
        live = alpha > 0.0
        la = jnp.log1p(-alpha)

        suf_in = _split_mm(la, _suf_excl()) + la + suf_log
        pre = log_t_fin - suf_in                       # log T_i (excl)
        trans = jnp.exp(jnp.maximum(pre, _LOG_EPS))    # T_i
        # ti carries the [T_i >= T_EPS] early-stop indicator
        ti = jnp.where(pre >= LOG_TEPS, trans, 0.0)
        w = alpha * ti                                 # (P, CHUNK)

        gc = _split_mm3(                               # (P, CHUNK)
            g, chunk[0:8, :], (((0,), (0,)), ((), ())))

        wgc = w * gc
        s_in = _split_mm(wgc, _suf_excl()) + suf_s

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = jnp.where(live, gc * ti - s_in / one_m, 0.0)

        # where live & unclamped: alpha == op * G with G = exp(min(power,
        # 0)), so d_power = d_alpha * op * G = d_alpha * alpha exactly and
        # G = alpha / op — no exp recompute (one transcendental saved).
        # The 1/op reciprocal is a (1, CHUNK) row op, not a (P, CHUNK)
        # divide.
        unclamped = (alpha < MAX_ALPHA)
        op = chunk[F_OP, :][None, :]
        recip_op = 1.0 / jnp.maximum(op, 1e-12)        # (1, CHUNK)
        dp = jnp.where(unclamped & live, d_alpha * alpha, 0.0)

        # ALL six pixel reductions for the scalar grads ride ONE moment
        # matmul: mom_k = sum_p dp * basis_k with basis [1,u,v,u^2,v^2,
        # uv] over tile-local centered pixel coords (_moment_basis). The
        # op grad is m0 / op directly (live requires power <= 0, and at
        # power == 0 the position/conic factors dx = dy = 0 vanish from
        # the reconstruction exactly, so no power < 0 mask is needed);
        # d_mx/../d_cc reconstruct from the moments by per-instance
        # (1, CHUNK) row algebra with mxl = mx - tile_center. Replaces
        # ~15 (P, CHUNK) VPU passes + 6 sublane reductions with 2 MXU
        # matmuls (K = P) on a bf16-exact basis.
        dph = dp.astype(jnp.bfloat16)
        dpl = (dp - dph.astype(jnp.float32)).astype(jnp.bfloat16)
        mb = _moment_basis(tile)
        dd = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mom = dd(mb, dph) + dd(mb, dpl)                # (8, CHUNK)
        m0, m1, m2 = mom[0:1], mom[1:2], mom[2:3]
        m3, m4, m5 = mom[3:4], mom[4:5], mom[5:6]
        tyg = t // nx
        txg = t - tyg * nx
        twk, thk = tile if isinstance(tile, tuple) else (tile, tile)
        mxl = chunk[F_MX, :][None, :] \
            - (txg * twk + twk // 2).astype(jnp.float32)
        myl = chunk[F_MY, :][None, :] \
            - (tyg * thk + thk // 2).astype(jnp.float32)
        dxs = mxl * m0 - m1                            # sum dp * dx
        dys = myl * m0 - m2
        dx2s = mxl * (mxl * m0 - 2.0 * m1) + m3        # sum dp * dx^2
        dy2s = myl * (myl * m0 - 2.0 * m2) + m4
        dxys = mxl * (myl * m0 - m2) - myl * m1 + m5   # sum dp * dx*dy
        ca = chunk[F_CA, :][None, :]
        cb = chunk[F_CB, :][None, :]
        cc = chunk[F_CC, :][None, :]
        r_op = m0 * recip_op
        r_mx = -(ca * dxs + cb * dys)
        r_my = -(cc * dys + cb * dxs)
        r_ca = -0.5 * dx2s
        r_cb = -dxys
        r_cc = -0.5 * dy2s

        d_rgb = _split_mm3(                            # (8, CHUNK)
            g, w, (((1,), (0,)), ((), ())))
        d_rgb16 = jnp.concatenate(
            [d_rgb, jnp.zeros((N_FEAT - 8, CHUNK), jnp.float32)], axis=0)
        scal16 = jnp.concatenate(
            [jnp.zeros((3, CHUNK), jnp.float32),
             r_op, r_mx, r_my, r_ca, r_cb, r_cc,
             jnp.zeros((N_FEAT - 9, CHUNK), jnp.float32)], axis=0)
        gchunk = d_rgb16 + scal16                      # (N_FEAT, CHUNK)

        @pl.when(i >= NB)
        def _():
            put_dma(slot, k).wait()  # waits the slot's previous write
        gbuf[slot] = gchunk
        put_dma(slot, k).start()

        suf_log = suf_log + jnp.sum(la, axis=1, keepdims=True)
        suf_s = suf_s + jnp.sum(wgc, axis=1, keepdims=True)
        return suf_log, suf_s

    suf0 = jnp.zeros((P, 1), jnp.float32)
    jax.lax.fori_loop(0, total, body, (suf0, suf0))

    for d in range(NB):  # drain the last NB in-flight puts
        @pl.when(total >= d + 1)
        def _(d=d):
            put_dma((total - 1 - d) % NB, 0).wait()


# ------------------------------------------------------------ XLA wrapper

def _gauss_feat(pg: ProjectedGaussians) -> jnp.ndarray:
    """Per-GAUSSIAN feature matrix (N_USED=10, N), row order
    r g b op mx my ca cb cc rad. project_gaussians emits exactly this
    as pg.feat (feature-major rows, no relayouts); the column-extract
    fallback below covers hand-built ProjectedGaussians (each extract
    is a lane<->sublane relayout, and separate per-field scalar gathers
    downstream would be ~100x slower still)."""
    if pg.feat is not None:
        return pg.feat
    opac = jnp.where(pg.mask, pg.opacity, 0.0)
    return jnp.stack([
        pg.rgb[:, 0], pg.rgb[:, 1], pg.rgb[:, 2],
        opac,
        pg.mean2d[:, 0], pg.mean2d[:, 1],
        pg.conic[:, 0], pg.conic[:, 1], pg.conic[:, 2],
        pg.radius,
    ], axis=0)                                      # (N_USED, N)


def _pack_aligned(feat, gauss_id, i_pad):
    """feat (N_USED, N) -> aligned instance array (N_FEAT, i_pad).

    Plain gather; its AD transpose (scatter-add over gauss ids) measured
    FASTER on TPU than a hand-written inverse-permute + sorted
    segment-sum backward, so default AD it is. TPU gathers are INDEX-
    bound (~7ns/index regardless of row count), so the row pad to
    N_FEAT happens BEFORE the gather (pad rows ride along free) and the
    lane pad rides the index vector — a post-gather jnp.pad measured
    ~1ms extra (it materializes a second (16, I) copy)."""
    n_used = feat.shape[0]
    if n_used < N_FEAT:
        feat = jnp.concatenate(
            [feat, jnp.zeros((N_FEAT - n_used,) + feat.shape[1:],
                             feat.dtype)], axis=0)
    idx = gauss_id
    if idx.shape[0] < i_pad:
        idx = jnp.pad(idx, (0, i_pad - idx.shape[0]))
    return feat[:, idx]                             # (N_FEAT, i_pad)


def _interpret_default():
    return jax.default_backend() != "tpu"


def _bg8(bg):
    return jnp.concatenate([bg.reshape(3, 1), jnp.zeros((5, 1))], axis=0)


def _pad_cells(starts, counts, T):
    """Pad per-tile tables to a TPC multiple (pad tiles are empty)."""
    cells = -(-T // TPC)
    pad = cells * TPC - T
    starts = jnp.pad(starts, (0, pad))
    counts = jnp.pad(counts, (0, pad))
    return starts, counts, cells


def _blend_pallas_core(inst, starts, counts, total, bg, nx, ny, tile,
                       width, height, power_mxu=None):
    """Returns ((T_pad, 8, P), (cells, TPC) int32): rows 0-2 composited
    rgb, row 3 final logT; plus per-subtile processed-chunk counts."""
    if power_mxu is None:
        power_mxu = POWER_MXU
    power_mxu = bool(power_mxu) and _grid_dims(tile) is not None
    return _blend_core_vjp(inst, starts, counts, total, bg, nx, ny, tile,
                           width, height, power_mxu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _blend_core_vjp(inst, starts, counts, total, bg, nx, ny, tile,
                    width, height, power_mxu):
    return _blend_fwd_call(inst, starts, counts, bg, nx, ny, tile,
                           width, height, power_mxu)


def _blend_fwd_call(inst, starts, counts, bg, nx, ny, tile, width, height,
                    power_mxu):
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    P = tw * th
    starts, counts, cells = _pad_cells(starts, counts, nx * ny)
    kernel = functools.partial(_fwd_kernel, nx=nx, tile=tile, tpc=TPC,
                               width=width, height=height,
                               power_mxu=power_mxu)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # inst stays HBM
            pl.BlockSpec((8, 1), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),        # bg
        ],
        out_specs=(
            pl.BlockSpec((TPC, 8, P), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole-array SMEM ref (a blocked (1, TPC) spec violates the
            # Mosaic min-tile rule); cells write disjoint [t0, t0+TPC)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),          # color accumulator
            pltpu.VMEM((P, 1), jnp.float32),          # log transmittance
            pltpu.VMEM((2, N_FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cells * TPC, 8, P), jnp.float32),
            jax.ShapeDtypeStruct((cells * TPC,), jnp.int32),
        ),
        interpret=_interpret_default(),
    )(starts, counts, inst, _bg8(bg))


def _blend_core_fwd(inst, starts, counts, total, bg, nx, ny, tile,
                    width, height, power_mxu):
    out, nchunks = _blend_fwd_call(inst, starts, counts, bg, nx, ny, tile,
                                   width, height, power_mxu)
    return (out, nchunks), (inst, starts, counts, total, bg, out, nchunks)


def _blend_core_bwd(nx, ny, tile, width, height, power_mxu, res, g_outs):
    inst, starts, counts, total, bg, fwd_out, nchunks = res
    g_out = g_outs[0]                  # cotangent for the int32 counts
    #                                    output is symbolic-zero; ignore
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    P = tw * th
    starts, counts, cells = _pad_cells(starts, counts, nx * ny)
    # the backward only needs the chunks the forward actually processed:
    # cap each subtile's instance count at done_chunks * CHUNK
    counts_eff = jnp.minimum(counts, nchunks * CHUNK)
    kernel = functools.partial(_bwd_kernel, nx=nx, tile=tile, tpc=TPC,
                               power_mxu=power_mxu)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # inst
            pl.BlockSpec((8, 1), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),        # bg
            pl.BlockSpec((TPC, 8, P), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),        # fwd out (logT)
            pl.BlockSpec((TPC, 8, P), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),        # g_out
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),   # ginst in HBM
        scratch_shapes=[
            pltpu.VMEM((4, N_FEAT, CHUNK), jnp.float32),
            pltpu.VMEM((4, N_FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((8, P), jnp.float32),          # g_scr
            pltpu.VMEM((P, 1), jnp.float32),          # ltf_scr
            pltpu.VMEM((P, 1), jnp.float32),          # sufs0_scr
        ],
    )
    ginst = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(inst.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret_default(),
    )(starts, counts_eff, inst, _bg8(bg), fwd_out, g_out)

    # columns never written by any tile are uninitialized memory: those
    # past the aligned end of each tile's PROCESSED prefix, and those
    # past the last valid instance. Build the per-slot write limit with
    # the same scatter+cummax flood fill as tiles.py (aligned starts are
    # non-decreasing).
    i_align = inst.shape[1]
    ends_eff = starts + counts_eff
    mark_pos = jnp.where(counts_eff > 0, starts, i_align)
    marks = jnp.zeros(i_align, jnp.int32).at[mark_pos].max(
        ends_eff, mode="drop")
    limit = jax.lax.cummax(marks)
    col = jnp.arange(i_align)
    ginst = jnp.where((col < limit) & (col < total), ginst, 0.0)

    # bg grad: sum over pixels of g . T_fin with the [T_fin >= T_EPS]
    # indicator (row 3 of fwd_out is logT)
    logt = fwd_out[:, 3:4, :]
    t_fin = jnp.exp(jnp.maximum(logt, _LOG_EPS)) * (logt >= LOG_TEPS)
    g_bg = jnp.sum(g_out[:, :3, :] * t_fin, axis=(0, 2))        # (3,)
    return ginst, None, None, None, g_bg


_blend_core_vjp.defvjp(_blend_core_fwd, _blend_core_bwd)


def blend_tiles_pallas(pg: ProjectedGaussians, bins: TileBins, width: int,
                       height: int, bg: jnp.ndarray,
                       tile: int = TILE,
                       power_mxu: bool | None = None) -> jnp.ndarray:
    """Pallas-kernel compositing. Returns (3, H, W) in [0, 1].

    Differentiable end to end: the instance pack (gather) and the final
    unpack are XLA ops whose AD transposes are scatter-adds; the blend
    itself uses the custom-VJP kernel pair. power_mxu (default: module
    POWER_MXU, env HUGS_POWER_MXU) selects the MXU alpha-quadratic; it
    needs tile dims divisible by the recenter grid spacing.
    """
    nx, ny = tile_grid(width, height, tile)
    tw, th = tile if isinstance(tile, tuple) else (tile, tile)
    tile = (tw, th)   # normalized (hashable) static arg for the kernels
    explicit = power_mxu is not None
    if power_mxu is None:
        power_mxu = POWER_MXU
    if power_mxu and _grid_dims(tile) is None:
        if explicit:
            raise ValueError(
                f"power_mxu=True requires tile dims divisible by "
                f"{_GRID_SP}; got tile={tile}")
        power_mxu = False        # env-default mode: fall back silently
    T = nx * ny

    # pad width to a CHUNK multiple for clean memref tiling (segments
    # themselves are CHUNK-aligned already: tiles.ALIGN == CHUNK)
    I = bins.gauss_id.shape[0]
    I_pad = (-(-I // CHUNK)) * CHUNK
    inst = _pack_aligned(_gauss_feat(pg), bins.gauss_id, I_pad)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    total = bins.aligned_total.astype(jnp.int32)

    out, _ = _blend_pallas_core(inst, bins.starts, counts, total, bg,
                                nx, ny, tile, width, height,
                                power_mxu)                    # (T_pad,8,P)
    img = out[:T, :3, :].reshape(ny, nx, 3, th, tw)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, ny * th, nx * tw)
    return jnp.clip(img[:, :height, :width], 0.0, 1.0)
