"""VPU peak microbenchmark: what does this chip actually sustain on the
blend kernel's op mix?

The round-2 speed-of-light analysis (BASELINE.md) pinned the Pallas
blend at "the v5e VPU roofline (~1 T f32 op/s)" — a number inferred
from the measured kernel itself, which is circular. This measures the
achievable elementwise ceiling directly with Pallas kernels of known op
count and near-zero memory traffic, in three flavors:

  fma      independent a*x+b chains (ILP-friendly upper bound)
  serial   one dependent chain (latency-bound lower bound)
  blendmix the blend inner loop's actual mix per (pixel, instance)
           pair: ~10 mul/add for the conic quadratic, exp, log1p,
           compares/selects, 2 chunk-axis reductions

If fma-peak >> blend-achieved, the kernel formulation (not the silicon)
is the wall and another round of kernel work is justified; if they
match, single-chip really is closed and scaling is the only lever.

Run on chip:  nohup timeout 1700 python scripts/vpu_peak.py > /tmp/vpu.log 2>&1 &
CPU smoke:    VPU_SMOKE=1 + local-CPU env (interpret mode, timing
              meaningless — correctness only).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SMOKE = bool(int(os.environ.get("VPU_SMOKE", "0")))
P = 1024            # pixels per tile (matches the blend's 32x32)
CHUNK = 128
GRID = 8 if SMOKE else 512
INNER = 4 if SMOKE else 64   # chunk iterations per grid cell
REPS = 1 if SMOKE else 3     # fori_loop reps inside the jit
INTERPRET = jax.devices()[0].platform != "tpu"


def _kernel(x_ref, o_ref, *, mode, inner):
    # Accumulate into the (shared) output block: the loop-carried
    # read-modify-write forces Mosaic to execute every grid iteration
    # (with a constant write, identical iterations writing one block
    # can legally collapse — measured: "1736 T op/s").
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...] + o_ref[...] * 1e-20  # (P, CHUNK) f32, carries dep
    if mode == "fma":
        # 4 independent chains x inner iterations x 2 ops (mul+add)
        a0 = x
        a1 = x * 1.0001
        a2 = x * 0.9999
        a3 = x + 0.5
        for _ in range(inner):
            a0 = a0 * 1.000001 + 0.3
            a1 = a1 * 0.999999 + 0.2
            a2 = a2 * 1.000002 + 0.1
            a3 = a3 * 0.999998 + 0.4
        o_ref[...] += a0 + a1 + a2 + a3
        # ops per element: inner * 8 (+7 setup, ignored)
    elif mode == "serial":
        a = x
        for _ in range(inner * 4):
            a = a * 1.000001 + 0.1       # one dependent chain
        o_ref[...] += a
        # ops per element: inner * 8
    else:  # blendmix — the fwd blend per-pair arithmetic, data-flow
        #         faithful (compare _chunk_alpha + the log-T prefix)
        acc = x * 0.0
        logt = x * 0.0
        for k in range(inner):
            dx = x + float(k)
            dy = x - float(k)
            power = -0.5 * (1e-2 * dx * dx + 1e-2 * dy * dy) \
                - 1e-3 * (dx * dy)                     # 8 ops
            alpha = jnp.minimum(0.99, 0.7 * jnp.exp(
                jnp.minimum(power, 0.0)))              # exp + 3
            keep = (power <= 0.0) & (alpha >= 1.0 / 255.0)  # 2 cmp
            alpha = jnp.where(keep, alpha, 0.0)        # select
            la = jnp.log1p(-alpha)                     # log1p + 1
            w = jnp.exp(logt) * alpha                  # exp + 1
            acc = acc + w                              # 1
            logt = logt + la                           # 1
        o_ref[...] += acc + logt
        # ops per element-iter: ~18 arith + 3 transcendental


def build(mode, reps):
    kern = functools.partial(_kernel, mode=mode, inner=INNER)
    call = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((P, CHUNK), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((P, CHUNK), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, CHUNK), jnp.float32),
        interpret=INTERPRET,
    )

    @jax.jit
    def run(x):
        def body(_, v):
            return call(v) * 1e-6        # data-chain reps
        # reduce to ONE scalar so the caller can np.asarray() it — a
        # host readback is the only sync this environment's relay PJRT
        # honors (block_until_ready returned in 0.1 ms for a 100 ms
        # kernel: measured "1888 T op/s")
        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))
    return run


def timed(run, x, n):
    """Best-of-n wall time of run(x) synced by a scalar host readback."""
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(run(x)))
        best = min(best, time.time() - t0)
    return best


def ops_per_elem(mode):
    if mode == "fma":
        return INNER * 8
    if mode == "serial":
        return INNER * 8
    return INNER * 21                    # counting transcendental as 1


def main():
    x = jnp.linspace(0.0, 1.0, P * CHUNK).reshape(P, CHUNK)
    out = {"P": P, "chunk": CHUNK, "grid": GRID, "inner": INNER,
           "device": jax.devices()[0].platform}
    n = 2 if SMOKE else 5
    extra = 1 if SMOKE else 8
    for mode in ("fma", "serial", "blendmix"):
        # Difference two rep counts to cancel constant dispatch/readback
        # overhead (the relay RTT here is ~85 ms — same order as the
        # kernel itself).
        run_lo = build(mode, REPS)
        run_hi = build(mode, REPS + extra)
        float(np.asarray(run_lo(x)))      # compile
        float(np.asarray(run_hi(x)))
        t_lo = timed(run_lo, x, n)
        t_hi = timed(run_hi, x, n)
        per_rep = max(t_hi - t_lo, 1e-9) / extra
        elems = P * CHUNK * GRID
        tops = ops_per_elem(mode) * elems / per_rep / 1e12
        out[mode] = {"s_per_rep": round(per_rep, 5),
                     "t_lo": round(t_lo, 4), "t_hi": round(t_hi, 4),
                     "tera_ops_per_s": round(tops, 3)}
        print(mode, out[mode], flush=True)
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    with open(os.path.join(ev, "vpu_peak.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
