"""Attribute the full-step time that the stage microbenches don't
explain. micro_loop.py stages sum to ~12-14 ms but the full fwd+bwd
step is ~17.3 ms; this decomposes the gap with chained-loop timings of
PARTIAL pipelines (same methodology: K data-chained iterations inside
one jit, see micro_loop.py docstring):

  renderL1_fwd      act+proj+bin+pack+blend+L1, forward only
  renderL1_fwd_bwd  the full step (reference number)
  blendpack_fb      grad wrt packed-side: L1(blend(pack(feat))), bins
                    fixed  -> pack+blend+loss fwd+bwd in isolation
  projfeat_fb       grad wrt params of <feat, probe>, feat =
                    _gauss_feat(project(act(params)))  -> act+proj+SH
                    fwd+bwd in isolation
  binning           (no grad path; same as micro_loop)

residue = renderL1_fwd_bwd - projfeat_fb - binning - blendpack_fb
is then pure composition cost: XLA copies between stages, recompute of
fwd values the bwd needs, grad-accumulation joins.

Run on chip:  nohup timeout 2500 python scripts/micro_resid.py > /tmp/resid.log 2>&1 &
CPU smoke:    RESID_SMOKE=1 + local-CPU env.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

SMOKE = bool(int(os.environ.get("RESID_SMOKE", "0")))
W, H = (96, 64) if SMOKE else (960, 540)
N = 500 if SMOKE else 50_000
BUDGET = 4096 if SMOKE else 131072
TILE = 32
K = 3 if SMOKE else 20


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
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(2 if SMOKE else 3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
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
    feat = _gauss_feat(pg)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    total = bins.aligned_total.astype(jnp.int32)
    nx, ny = -(-W // TILE), -(-H // TILE)
    print("n_instances", int(bins.n_instances), "aligned", int(total),
          flush=True)

    def chain(x, s):
        return x + s.astype(x.dtype) * 1e-37

    def loss_of(img):
        return jnp.mean(jnp.abs(img - target))

    def render_loss(params):
        m, s, q, o, c = act(params)
        img = render(m, s, q, o, c, camera=cam, width=W, height=H,
                     bg=bg, active_sh_degree=3, backend="pallas",
                     tile_cap=1024, instance_budget=BUDGET,
                     tile=TILE)["render"]
        return loss_of(img)

    # ---- full forward only ----
    @jax.jit
    def fwd_loop(params):
        def body(_, carry):
            p, acc = carry
            l = render_loss(p)
            return (jax.tree.map(lambda a: chain(a, l), p), acc + l)
        return jax.lax.fori_loop(0, K, body, (params, 0.0))[1]
    rec("renderL1_fwd", *timed_loop(fwd_loop, params))

    # ---- full fwd+bwd (the reference number) ----
    @jax.jit
    def full_loop(params):
        def body(_, p):
            g = jax.grad(render_loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
        return jax.lax.fori_loop(0, K, body, params)
    rec("renderL1_fwd_bwd", *timed_loop(full_loop, params))

    # ---- pack+blend+L1 fwd+bwd, bins fixed ----
    def blendpack_loss(f):
        i2 = _pack_aligned(f, bins.gauss_id, I_pad)
        out, _ = _blend_pallas_core(i2, bins.starts, counts, total, bg,
                                    nx, ny, TILE, W, H)
        img = out[:nx * ny, :3, :].reshape(ny, nx, 3, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            3, ny * TILE, nx * TILE)
        return loss_of(jnp.clip(img[:, :H, :W], 0.0, 1.0))

    @jax.jit
    def blendpack_loop(feat):
        gfn = jax.grad(blendpack_loss)

        def body(_, carry):
            f, acc = carry
            g = gfn(f)
            t = jnp.sum(g[0, :128])
            return chain(f, t), acc + t
        return jax.lax.fori_loop(0, K, body, (feat, 0.0))[1]
    rec("blendpack_fb", *timed_loop(blendpack_loop, feat))

    # ---- act+proj+SH(feat) fwd+bwd ----
    probe = jax.random.normal(jax.random.PRNGKey(3), feat.shape) * 1e-3

    def projfeat_loss(params):
        m, s, q, o, c = act(params)
        pgi = project_gaussians(m, s, q, o, c, cam, W, H, 3)
        return jnp.sum(_gauss_feat(pgi) * probe)

    @jax.jit
    def projfeat_loop(params):
        def body(_, p):
            g = jax.grad(projfeat_loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
        return jax.lax.fori_loop(0, K, body, params)
    rec("projfeat_fb", *timed_loop(projfeat_loop, params))

    # ---- binning (no grad) ----
    @jax.jit
    def bin_loop(pg):
        def body(_, carry):
            m2, acc = carry
            b = bin_gaussians(pg._replace(mean2d=m2), W, H, BUDGET, TILE)
            t = b.aligned_total.astype(jnp.float32)
            return chain(m2, t), acc + t
        return jax.lax.fori_loop(0, K, body, (pg.mean2d, 0.0))[1]
    rec("binning", *timed_loop(bin_loop, pg))

    resid = results["renderL1_fwd_bwd"] - results["projfeat_fb"] \
        - results["binning"] - results["blendpack_fb"]
    results["residue"] = round(resid, 4)
    print(f"residue (composition cost): {resid:.3f} ms", flush=True)
    results["device"] = jax.devices()[0].platform
    out = os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "micro_resid.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
