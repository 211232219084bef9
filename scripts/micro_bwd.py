"""Diagnostic split of the bwd blend kernel cost (TPU):

  full      the real _bwd_kernel                        (baseline)
  skeleton  same DMA/scalar/loop structure, same MXU suffix matmuls,
            but the per-chunk elementwise gradient math replaced by one
            multiply — isolates fixed per-chunk cost (DMA waits, scalar
            ctx, loop, MXU launches) from VPU gradient arithmetic.

Run: PYTHONPATH=/root/repo nohup timeout 1700 python scripts/micro_bwd.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from hugs_tpu.render import make_camera
from hugs_tpu.render.project import project_gaussians
from hugs_tpu.render.tiles import bin_gaussians
from hugs_tpu.render.pallas_blend import (
    _gauss_feat, _pack_aligned, _blend_fwd_call, _pad_cells, _cell_tables,
    _chunk_ctx, _split_mm, _suf_excl, _tile_pixels, _chunk_alpha,
    CHUNK, N_FEAT, TPC, _bg8)

W, H = 960, 540
N = 50_000
BUDGET = 131072
TILE = 32


def _skel_kernel(starts_ref, counts_ref, inst_hbm, bg_ref, fout_ref,
                 gout_ref, ginst_hbm, buf, gbuf, sems, gsems,
                 g_scr, ltf_scr, sufs0_scr, *, nx, tile, tpc,
                 with_k8=True, with_suf=True):
    c = pl.program_id(0)
    P = tile * tile
    t0 = c * tpc
    counts, nch, cum, total = _cell_tables(starts_ref, counts_ref, t0, tpc)
    starts = [starts_ref[t0 + i] for i in range(tpc)]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)

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

    NB = 4
    for d in range(NB - 1):
        @pl.when(total > d)
        def _(d=d):
            get_dma(d, total - 1 - d).start()

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

        @pl.when(first_visit)
        def _():
            g0 = gout_ref[pl.ds(s, 1), :, :][0]
            g_scr[...] = jnp.where(row < 3, g0, 0.0)

        g = g_scr[...]
        suf_log = jnp.where(first_visit, 0.0, suf_log)
        suf_s = jnp.where(first_visit, 0.0, suf_s)

        t = t0 + s
        px, py = _tile_pixels(t, nx, tile)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        valid = (lane < (count_s - ci * CHUNK)).astype(jnp.float32)
        la = chunk[F0:F0 + 1, :] * valid + px * 0.0  # (P, CHUNK) broadcast

        # same MXU traffic as the real kernel: 2 suffix split-mms + the
        # two K=8 HIGHEST matmuls (each removable via flags)
        if with_suf:
            suf_in = _split_mm(la, _suf_excl()) + la + suf_log
        else:
            suf_in = la + suf_log
        if with_k8:
            gc = jax.lax.dot_general(
                g, chunk[0:8, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            gc = suf_in + 1.0
        wgc = suf_in * gc
        if with_suf:
            s_in = _split_mm(wgc, _suf_excl()) + suf_s
        else:
            s_in = wgc + suf_s
        if with_k8:
            d_rgb = jax.lax.dot_general(
                g, wgc, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            d_rgb = s_in[0:8, :] * 2.0
        gchunk = jnp.concatenate(
            [d_rgb[0:8, :CHUNK], s_in[0:8, :]], axis=0)  # (16, CHUNK)

        @pl.when(i >= NB)
        def _():
            put_dma(slot, k).wait()
        gbuf[slot] = gchunk
        put_dma(slot, k).start()

        suf_log = suf_log + jnp.sum(la, axis=1, keepdims=True)
        suf_s = suf_s + jnp.sum(wgc, axis=1, keepdims=True)
        return suf_log, suf_s

    suf0 = jnp.zeros((P, 1), jnp.float32)
    jax.lax.fori_loop(0, total, body, (suf0, suf0))

    for d in range(NB):
        @pl.when(total >= d + 1)
        def _(d=d):
            put_dma((total - 1 - d) % NB, 0).wait()


F0 = 3


def build():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    means = jax.random.uniform(ks[0], (N, 3), minval=-2.0, maxval=2.0)
    means = means.at[:, 2].set(means[:, 2] * 1.5 + 5.0)
    scales = jnp.exp(jax.random.normal(ks[1], (N, 3)) * 0.3 - 4.0)
    rotq = jax.random.normal(ks[2], (N, 4))
    rotq = rotq / jnp.linalg.norm(rotq, axis=-1, keepdims=True)
    op = jax.nn.sigmoid(jax.random.normal(ks[3], (N,)))
    shs = jax.random.normal(ks[4], (N, 16, 3)) * 0.3
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    pg = project_gaussians(means, scales, rotq, op, shs, cam, W, H, 3)
    bins = bin_gaussians(pg, W, H, BUDGET, TILE)
    I = bins.gauss_id.shape[0]
    I_pad = (-(-I // CHUNK)) * CHUNK
    inst = _pack_aligned(_gauss_feat(pg), bins.gauss_id, I_pad)
    return pg, bins, inst


def timed(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    pg, bins, inst = build()
    bg = jnp.zeros(3)
    nx, ny = -(-W // TILE), -(-H // TILE)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    P = TILE * TILE

    fwd_out, nchunks = jax.jit(
        lambda i, s, c: _blend_fwd_call(i, s, c, bg, nx, ny, TILE, W, H,
                                        False)
    )(inst, bins.starts, counts)
    g_out = jnp.ones_like(fwd_out)

    starts_p, counts_p, cells = _pad_cells(bins.starts, counts, nx * ny)
    counts_eff = jnp.minimum(counts_p, nchunks * CHUNK)

    def make_skel(**kw):
        return functools.partial(_skel_kernel, nx=nx, tile=TILE, tpc=TPC,
                                 **kw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, 1), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TPC, 8, P), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TPC, 8, P), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, N_FEAT, CHUNK), jnp.float32),
            pltpu.VMEM((4, N_FEAT, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((8, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )

    for name, kw in [("skeleton", {}),
                     ("skeleton_no_k8", {"with_k8": False}),
                     ("skeleton_no_suf", {"with_suf": False}),
                     ("skeleton_dma_only", {"with_k8": False,
                                            "with_suf": False})]:
        kern = make_skel(**kw)

        @jax.jit
        def skel(starts_p, counts_eff, inst, fwd_out, g_out, kern=kern):
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(inst.shape, jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(starts_p, counts_eff, inst, _bg8(bg), fwd_out, g_out)

        ms = timed(skel, starts_p, counts_eff, inst, fwd_out, g_out)
        print(f"{name}: {ms:.3f} ms", flush=True)

    from hugs_tpu.render.pallas_blend import _blend_pallas_core
    total = bins.aligned_total.astype(jnp.int32)

    @jax.jit
    def full_grad(inst):
        def f(inst):
            out, _ = _blend_pallas_core(inst, bins.starts, counts, total,
                                        bg, nx, ny, TILE, W, H)
            return jnp.sum(out[:, :3, :])
        return jax.grad(f)(inst)

    ms_full = timed(full_grad, inst)
    print(f"full fwd+bwd: {ms_full:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
