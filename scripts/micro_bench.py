"""TPU microbenches for the render-step hot ops: dispatch overhead,
sort-length sensitivity, gather/scatter cost, and the bench scene's true
instance count. Informs budget auto-sizing + binning optimization."""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, H = 960, 540
N = 50_000


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
    from scripts.profile_render import build_scene
    from hugs_tpu.render import make_camera
    from hugs_tpu.render.project import project_gaussians
    from hugs_tpu.render.tiles import bin_gaussians

    params = build_scene(N)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    m, ls, q, ol, c = params
    pg = jax.jit(lambda: project_gaussians(
        m, jnp.exp(ls), q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        jax.nn.sigmoid(ol), c, cam, W, H, 3))()
    bins = jax.jit(lambda pg: bin_gaussians(pg, W, H, 1 << 18, 32))(pg)
    print("n_instances", int(bins.n_instances),
          "aligned_total", int(bins.aligned_total), flush=True)

    # dispatch overhead: trivial op
    x = jnp.ones((8, 128))
    print("nop", timed(jax.jit(lambda x: x + 1), x), "ms", flush=True)

    # sort length sensitivity (single int32 key + 2 payloads, like binning)
    for sz in (1 << 16, 1 << 17, 1 << 18):
        k = jax.random.randint(jax.random.PRNGKey(0), (sz,), 0, 1 << 30)
        p1 = jnp.arange(sz, dtype=jnp.int32)
        f = jax.jit(lambda k, p1: jax.lax.sort((k, p1, p1), num_keys=1))
        print(f"sort3 {sz}", timed(f, k, p1), "ms", flush=True)

    # argsort of N depths
    d = jax.random.uniform(jax.random.PRNGKey(1), (N,))
    print("argsort50k", timed(jax.jit(jnp.argsort), d), "ms", flush=True)

    # gather (16, I) from (16, N) + its transpose scatter-add
    feat = jax.random.uniform(jax.random.PRNGKey(2), (16, N))
    for sz in (1 << 17, 1 << 18):
        gid = jax.random.randint(jax.random.PRNGKey(3), (sz,), 0, N)
        gf = jax.jit(lambda f, g: f[:, g])
        print(f"gather16x{sz}", timed(gf, feat, gid), "ms", flush=True)
        gr = jax.jit(lambda f, g: jax.vjp(lambda f: f[:, g], f)[1](
            jnp.ones((16, sz)))[0])
        print(f"scatterT16x{sz}", timed(gr, feat, gid), "ms", flush=True)

    # full binning at two budgets
    for bud in (1 << 17, 1 << 18):
        bf = jax.jit(lambda pg: bin_gaussians(pg, W, H, bud, 32))
        print(f"bin {bud}", timed(bf, pg), "ms", flush=True)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
