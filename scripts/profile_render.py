"""Stage-level timing of the bench render step on the attached device.

Decomposes bench.py's fwd+bwd step into pipeline stages, each jitted and
timed separately (block_until_ready), so we know where the milliseconds
go before optimizing. Writes evidence/profile_stages.json.

Run with the DEFAULT env (TPU through the axon tunnel):
    nohup timeout 1700 python scripts/profile_render.py > /tmp/prof.log 2>&1 &
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
BUDGET = 1 << 18
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


def timed(fn, *args, iters=10, warmup=3):
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
    from hugs_tpu.render import make_camera
    from hugs_tpu.render.project import project_gaussians
    from hugs_tpu.render.tiles import bin_gaussians
    from hugs_tpu.render import render
    from hugs_tpu.render.pallas_blend import (
        _gauss_feat, _pack_aligned, _blend_pallas_core, CHUNK)

    params = build_scene(N)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    target = jax.random.uniform(jax.random.PRNGKey(9), (3, H, W))
    bg = jnp.zeros(3)
    results = {}

    def act(params):
        m, ls, q, ol, c = params
        return (m, jnp.exp(ls), q / jnp.linalg.norm(q, axis=-1, keepdims=True),
                jax.nn.sigmoid(ol), c)

    # --- A: projection fwd ---
    @jax.jit
    def proj_fwd(params):
        m, s, q, o, c = act(params)
        return project_gaussians(m, s, q, o, c, cam, W, H, 3)
    ms, cs = timed(proj_fwd, params)
    results["A_project_fwd"] = ms
    print("A project fwd", ms, "ms (compile", cs, "s)", flush=True)

    # --- B: projection fwd+bwd (scalar pseudo-loss over all outputs) ---
    @jax.jit
    def proj_grad(params):
        def f(p):
            m, s, q, o, c = act(p)
            pg = project_gaussians(m, s, q, o, c, cam, W, H, 3)
            return (jnp.sum(pg.mean2d) + jnp.sum(pg.conic) + jnp.sum(pg.rgb)
                    + jnp.sum(pg.opacity) + jnp.sum(pg.depth))
        return jax.grad(f)(params)
    ms, cs = timed(proj_grad, params)
    results["B_project_fwd_bwd"] = ms
    print("B project fwd+bwd", ms, "ms (compile", cs, "s)", flush=True)

    pg = proj_fwd(params)
    pg = jax.tree.map(lambda x: x, pg)

    # --- C: binning ---
    @jax.jit
    def binning(pg):
        return bin_gaussians(pg, W, H, BUDGET, TILE)
    ms, cs = timed(binning, pg)
    results["C_binning"] = ms
    print("C binning", ms, "ms (compile", cs, "s)", flush=True)

    bins = binning(pg)

    # --- D: instance pack fwd ---
    I = bins.gauss_id.shape[0]
    I_pad = (-(-I // CHUNK)) * CHUNK

    @jax.jit
    def pack_fwd(pg, bins):
        return _pack_aligned(_gauss_feat(pg), bins.gauss_id, I_pad)
    ms, cs = timed(pack_fwd, pg, bins)
    results["D_pack_fwd"] = ms
    print("D pack fwd", ms, "ms (compile", cs, "s)", flush=True)

    # --- E: pack fwd+bwd ---
    @jax.jit
    def pack_grad(pg, bins):
        def f(pg):
            return jnp.sum(pack_fwd.__wrapped__(pg, bins))
        return jax.grad(f, allow_int=True)(pg)
    ms, cs = timed(pack_grad, pg, bins)
    results["E_pack_fwd_bwd"] = ms
    print("E pack fwd+bwd", ms, "ms (compile", cs, "s)", flush=True)

    inst = pack_fwd(pg, bins)
    counts = (bins.ends - bins.starts).astype(jnp.int32)
    total = bins.aligned_total.astype(jnp.int32)
    nx, ny = -(-W // TILE), -(-H // TILE)

    # --- F: pallas blend fwd ---
    @jax.jit
    def blend_fwd(inst, starts, counts, total):
        return _blend_pallas_core(inst, starts, counts, total, bg, nx, ny,
                                  TILE, W, H)[0]
    ms, cs = timed(blend_fwd, inst, bins.starts, counts, total)
    results["F_blend_fwd"] = ms
    print("F blend fwd", ms, "ms (compile", cs, "s)", flush=True)

    # --- G: pallas blend fwd+bwd ---
    @jax.jit
    def blend_grad(inst, starts, counts, total):
        def f(inst):
            out, _ = _blend_pallas_core(inst, starts, counts, total,
                                        bg, nx, ny, TILE, W, H)
            return jnp.sum(out[:, :3, :])
        return jax.grad(f)(inst)
    ms, cs = timed(blend_grad, inst, bins.starts, counts, total)
    results["G_blend_fwd_bwd"] = ms
    print("G blend fwd+bwd", ms, "ms (compile", cs, "s)", flush=True)

    # --- H: full render fwd ---
    @jax.jit
    def full_fwd(params):
        m, s, q, o, c = act(params)
        return render(m, s, q, o, c, camera=cam, width=W, height=H, bg=bg,
                      active_sh_degree=3, backend="pallas",
                      instance_budget=BUDGET, tile=TILE)["render"]
    ms, cs = timed(full_fwd, params)
    results["H_full_fwd"] = ms
    print("H full fwd", ms, "ms (compile", cs, "s)", flush=True)

    # --- I: full fwd+bwd (bench loss) ---
    @jax.jit
    def full_grad(params):
        def loss_fn(p):
            img = full_fwd.__wrapped__(p)
            return jnp.mean(jnp.abs(img - target))
        return jax.grad(loss_fn)(params)
    ms, cs = timed(full_grad, params)
    results["I_full_fwd_bwd"] = ms
    print("I full fwd+bwd", ms, "ms (compile", cs, "s)", flush=True)

    results["device"] = jax.devices()[0].platform
    out = os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "profile_stages.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
