"""Relay-noise-free stage timing: each stage runs K iterations inside
ONE jitted lax.fori_loop (iterations data-chained so XLA can't elide or
overlap them), so device_ms = (wall - dispatch) / K with dispatch noise
amortized to ~nothing. The most trustworthy decomposition available
through the axon tunnel (per-call timing carries 1.5-3 ms of relay
jitter; jax.profiler traces don't cross the relay).

Run (default TPU env):
    PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 2500 \
        python scripts/micro_loop.py > /tmp/microloop.log 2>&1 &

Writes evidence/micro_loop.json.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, H = 960, 540
N = 50_000
BUDGET = 131072
TILE = 32
K = 20


def build_scene(n, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-2.0, maxval=2.0)
    means = means.at[:, 2].set(means[:, 2] * 1.5 + 5.0)
    log_scales = jax.random.normal(ks[1], (n, 3)) * 0.3 - 4.0
    rotq = jax.random.normal(ks[2], (n, 4))
    opacity_logit = jax.random.normal(ks[3], (n,))
    shs = jax.random.normal(ks[4], (n, 16, 3)) * 0.3
    return means, log_scales, rotq, opacity_logit, shs


def timed_loop(fn, *args, k=K):
    """fn must be a jitted function running k chained iterations."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best / k * 1e3, compile_s


def main():
    from hugs_tpu.render import make_camera, render
    from hugs_tpu.render.project import project_gaussians
    from hugs_tpu.render.tiles import bin_gaussians
    from hugs_tpu.render.pallas_blend import (
        _gauss_feat, _pack_aligned, _blend_pallas_core, CHUNK)

    params = build_scene(N)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    target = jax.random.uniform(jax.random.PRNGKey(9), (3, H, W))
    bg = jnp.zeros(3)
    results = {}

    def rec(name, ms, cs):
        results[name] = round(ms, 4)
        print(f"{name}: {ms:.3f} ms/iter (compile {cs:.1f}s)", flush=True)

    def act(params):
        m, ls, q, ol, c = params
        return (m, jnp.exp(ls),
                q / jnp.linalg.norm(q, axis=-1, keepdims=True),
                jax.nn.sigmoid(ol), c)

    # stage inputs (computed once)
    @jax.jit
    def setup(params):
        m, s, q, o, c = act(params)
        pg = project_gaussians(m, s, q, o, c, cam, W, H, 3)
        bins = bin_gaussians(pg, W, H, BUDGET, TILE)
        return pg, bins

    pg, bins = setup(params)
    I = bins.gauss_id.shape[0]
    I_pad = (-(-I // CHUNK)) * CHUNK
    inst = _pack_aligned(_gauss_feat(pg), bins.gauss_id, I_pad)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    total = bins.aligned_total.astype(jnp.int32)
    nx, ny = -(-W // TILE), -(-H // TILE)
    print("n_instances", int(bins.n_instances), "aligned", int(total),
          flush=True)

    def chain(x, s):  # tiny data dependency; numerically ~invisible
        return x + s.astype(x.dtype) * 1e-37

    # ---- projection fwd ----
    @jax.jit
    def proj_loop(params):
        m, s, q, o, c = act(params)

        def body(_, carry):
            m2, acc = carry
            pgi = project_gaussians(m2, s, q, o, c, cam, W, H, 3)
            t = jnp.sum(pgi.mean2d[0])
            return chain(m2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (m, 0.0))[1]
    rec("proj_fwd", *timed_loop(proj_loop, params))

    # ---- binning ----
    @jax.jit
    def bin_loop(pg):
        def body(_, carry):
            m2, acc = carry
            b = bin_gaussians(pg._replace(mean2d=m2), W, H, BUDGET, TILE)
            t = b.aligned_total.astype(jnp.float32)
            return chain(m2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (pg.mean2d, 0.0))[1]
    rec("binning", *timed_loop(bin_loop, pg))

    # ---- pack fwd (gather) ----
    @jax.jit
    def pack_loop(pg, bins):
        feat = _gauss_feat(pg)

        def body(_, carry):
            f2, acc = carry
            out = _pack_aligned(f2, bins.gauss_id, I_pad)
            t = jnp.sum(out[0, :128])
            return chain(f2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (feat, 0.0))[1]
    rec("pack_fwd", *timed_loop(pack_loop, pg, bins))

    # ---- pack bwd (scatter-add transpose) ----
    @jax.jit
    def packbwd_loop(pg, bins):
        feat = _gauss_feat(pg)
        gfn = jax.grad(
            lambda f: jnp.sum(_pack_aligned(f, bins.gauss_id, I_pad)))

        def body(_, carry):
            f2, acc = carry
            g = gfn(f2)
            t = jnp.sum(g[0, :128])
            return chain(f2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (feat, 0.0))[1]
    rec("pack_bwd", *timed_loop(packbwd_loop, pg, bins))

    # ---- blend fwd ----
    @jax.jit
    def blendf_loop(inst, starts, counts, total):
        def body(_, carry):
            i2, acc = carry
            out, _ = _blend_pallas_core(i2, starts, counts, total, bg,
                                        nx, ny, TILE, W, H)
            t = jnp.sum(out[0, :3, :8])
            return chain(i2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (inst, 0.0))[1]
    rec("blend_fwd", *timed_loop(blendf_loop, inst, bins.starts, counts,
                                 total))

    # ---- blend fwd+bwd ----
    @jax.jit
    def blendg_loop(inst, starts, counts, total):
        gfn = jax.grad(lambda i: jnp.sum(_blend_pallas_core(
            i, starts, counts, total, bg, nx, ny, TILE, W, H)[0][:, :3, :]))

        def body(_, carry):
            i2, acc = carry
            g = gfn(i2)
            t = jnp.sum(g[0, :128])
            return chain(i2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (inst, 0.0))[1]
    rec("blend_fwd_bwd", *timed_loop(blendg_loop, inst, bins.starts,
                                     counts, total))

    # ---- full train-ish step ----
    def loss_fn(params):
        m, s, q, o, c = act(params)
        img = render(m, s, q, o, c, camera=cam, width=W, height=H,
                     bg=bg, active_sh_degree=3, backend="pallas",
                     tile_cap=1024, instance_budget=BUDGET,
                     tile=TILE)["render"]
        return jnp.mean(jnp.abs(img - target))

    @jax.jit
    def full_loop(params):
        def body(_, p):
            g = jax.grad(loss_fn)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
        return jax.lax.fori_loop(0, K, body, params)
    rec("full_fwd_bwd", *timed_loop(full_loop, params))

    results["device"] = jax.devices()[0].platform
    out = os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "micro_loop.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
