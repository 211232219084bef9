"""Does the v5e VPU run packed bf16 elementwise ops at 2x f32 throughput?

The blend kernel is VPU-elementwise-bound (BASELINE.md "Measured"); if
Mosaic emits packed 16-bit lanes for bf16 arithmetic on v5e, a bf16
compute mode would halve the dominant (P, CHUNK) pass cost. This micro
measures pure in-VMEM elementwise throughput per dtype, no HBM traffic:
one Pallas kernel runs R chained madd (or exp) passes over a (1024, 128)
block; K kernel calls are chained inside one jitted fori_loop
(micro_loop.py methodology - relay-noise-free).

Run:
    PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 1700 \
        python scripts/micro_bf16.py > /tmp/micro_bf16.log 2>&1 &

Writes evidence/micro_bf16.json.
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

P, C = 1024, 128
K = 20           # chained kernel calls per timed block


def _kernel(c_ref, x_ref, o_ref, *, op, r):
    x = x_ref[:]
    # runtime multiplier (SMEM scalar input) -> nothing can constant-fold;
    # the f32->dtype convert is a VECTOR op (Mosaic has no scalar bf16
    # arith)
    cv = jnp.full(x.shape, c_ref[0, 0], jnp.float32).astype(x.dtype)
    ev = jnp.full(x.shape, 1e-3, x.dtype)

    def body(_, v):
        if op == "madd":
            return v * cv + ev
        # exp-ish: keep argument bounded so the loop doesn't diverge
        return jnp.exp(-jnp.abs(v)) + ev

    o_ref[:] = jax.lax.fori_loop(0, r, body, x)


def make_fn(dtype, op, r):
    call = pl.pallas_call(
        functools.partial(_kernel, op=op, r=r),
        out_shape=jax.ShapeDtypeStruct((P, C), dtype),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def block(c, x):
        return jax.lax.fori_loop(0, K, lambda _, v: call(c, v), x)

    return block


def timed(fn, x):
    c = jnp.array([[0.9999], [0.0]], jnp.float32)[:1]
    t0 = time.time()
    out = fn(c, x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        out = fn(c, x)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / K * 1e3, compile_s


def main():
    results = {"device": jax.default_backend()}
    # R-scaling sanity: if time doesn't scale ~linearly with R, the loop
    # was elided and none of the numbers mean anything
    for op in ("madd", "exp"):
        for dtype in (jnp.float32, jnp.bfloat16):
            name = f"{op}_{jnp.dtype(dtype).name}"
            x = jnp.full((P, C), 0.5, dtype)
            per_r = {}
            for r in (8192, 32768):
                ms, cs = timed(make_fn(dtype, op, r), x)
                gops = P * C * r / (ms * 1e-3) / 1e9
                per_r[r] = {"ms_per_call": round(ms, 4),
                            "gop_s": round(gops, 1)}
                print(f"{name} r={r}: {ms:.4f} ms/call = {gops:.0f} Gop/s "
                      f"(compile {cs:.1f}s)", flush=True)
            results[name] = per_r[32768]
            results[name]["r_scaling"] = round(
                per_r[32768]["ms_per_call"] / max(per_r[8192]["ms_per_call"],
                                                  1e-9), 2)
    for op in ("madd", "exp"):
        f32 = results[f"{op}_float32"]["gop_s"]
        bf16 = results[f"{op}_bfloat16"]["gop_s"]
        results[f"{op}_bf16_speedup"] = round(bf16 / f32, 3)
        print(f"{op}: bf16/f32 = {bf16 / f32:.2f}x", flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "micro_bf16.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
