"""Dispatch-corrected stage timing at the EXACT bench.py config
(50k gauss, 960x540, tile=32, budget=131072) + a tile=16 A/B.

profile_render.py's standalone numbers are inflated by the per-call
relay dispatch overhead (several ms through the axon tunnel); this
script measures a null jitted op with the same harness and reports both
raw and corrected times. Writes evidence/micro_stages.json.

Run (default TPU env):
    PYTHONPATH=/root/repo nohup timeout 1700 python scripts/micro_stages.py \
        > /tmp/micro.log 2>&1 &
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


def build_scene(n, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-2.0, maxval=2.0)
    means = means.at[:, 2].set(means[:, 2] * 1.5 + 5.0)
    log_scales = jax.random.normal(ks[1], (n, 3)) * 0.3 - 4.0
    rotq = jax.random.normal(ks[2], (n, 4))
    opacity_logit = jax.random.normal(ks[3], (n,))
    shs = jax.random.normal(ks[4], (n, 16, 3)) * 0.3
    return means, log_scales, rotq, opacity_logit, shs


def timed(fn, *args, iters=20, warmup=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3, compile_s


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
        results[name] = ms
        print(f"{name}: {ms:.3f} ms (compile {cs:.1f}s)", flush=True)

    # 0. null dispatch baseline
    xsmall = jnp.ones((8, 128))
    rec("null_dispatch", *timed(jax.jit(lambda x: x + 1.0), xsmall))

    def act(params):
        m, ls, q, ol, c = params
        return (m, jnp.exp(ls), q / jnp.linalg.norm(q, axis=-1,
                                                    keepdims=True),
                jax.nn.sigmoid(ol), c)

    @jax.jit
    def proj_fwd(params):
        m, s, q, o, c = act(params)
        return project_gaussians(m, s, q, o, c, cam, W, H, 3)
    rec("proj_fwd", *timed(proj_fwd, params))

    @jax.jit
    def proj_grad(params):
        def f(p):
            m, s, q, o, c = act(p)
            pg = project_gaussians(m, s, q, o, c, cam, W, H, 3)
            return (jnp.sum(pg.mean2d) + jnp.sum(pg.conic)
                    + jnp.sum(pg.rgb) + jnp.sum(pg.opacity)
                    + jnp.sum(pg.depth))
        return jax.grad(f)(params)
    rec("proj_fwd_bwd", *timed(proj_grad, params))

    pg = proj_fwd(params)

    @jax.jit
    def binning(pg):
        return bin_gaussians(pg, W, H, BUDGET, TILE)
    rec("binning", *timed(binning, pg))
    bins = binning(pg)
    print("n_instances:", int(bins.n_instances),
          "aligned_total:", int(bins.aligned_total), flush=True)

    I = bins.gauss_id.shape[0]
    I_pad = (-(-I // CHUNK)) * CHUNK

    @jax.jit
    def pack_fwd(pg, bins):
        return _pack_aligned(_gauss_feat(pg), bins.gauss_id, I_pad)
    rec("pack_fwd", *timed(pack_fwd, pg, bins))

    @jax.jit
    def pack_grad(pg, bins):
        def f(pg):
            return jnp.sum(pack_fwd.__wrapped__(pg, bins))
        return jax.grad(f, allow_int=True)(pg)
    rec("pack_fwd_bwd", *timed(pack_grad, pg, bins))

    inst = pack_fwd(pg, bins)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    total = bins.aligned_total.astype(jnp.int32)
    nx, ny = -(-W // TILE), -(-H // TILE)

    @jax.jit
    def blend_fwd(inst, starts, counts, total):
        return _blend_pallas_core(inst, starts, counts, total, bg, nx, ny,
                                  TILE, W, H)[0]
    rec("blend_fwd", *timed(blend_fwd, inst, bins.starts, counts, total))

    @jax.jit
    def blend_grad(inst, starts, counts, total):
        def f(inst):
            out, _ = _blend_pallas_core(inst, starts, counts, total,
                                        bg, nx, ny, TILE, W, H)
            return jnp.sum(out[:, :3, :])
        return jax.grad(f)(inst)
    rec("blend_fwd_bwd", *timed(blend_grad, inst, bins.starts, counts,
                                total))

    def make_full(tile, budget):
        def loss_fn(params):
            m, s, q, o, c = act(params)
            img = render(m, s, q, o, c, camera=cam, width=W, height=H,
                         bg=bg, active_sh_degree=3, backend="pallas",
                         tile_cap=1024, instance_budget=budget,
                         tile=tile)["render"]
            return jnp.mean(jnp.abs(img - target))
        return loss_fn

    rec("full_fwd_t32", *timed(jax.jit(
        lambda p: make_full(32, BUDGET)(p)), params))
    rec("full_fwd_bwd_t32", *timed(jax.jit(
        jax.grad(make_full(32, BUDGET))), params))
    rec("full_fwd_bwd_t16", *timed(jax.jit(
        jax.grad(make_full(16, 262144))), params))

    results["device"] = jax.devices()[0].platform
    out = os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "micro_stages.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
