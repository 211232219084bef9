"""Follow-up TPU microbenches: tile-16 vs tile-32 duplication/chunk math
and op-level timing of bin_gaussians internals."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, H = 960, 540
N = 50_000
BUDGET = 1 << 18


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
    from hugs_tpu.render.tiles import bin_gaussians, tile_grid

    params = build_scene(N)
    m, ls, q, ol, c = params
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    pg = jax.jit(lambda: project_gaussians(
        m, jnp.exp(ls), q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        jax.nn.sigmoid(ol), c, cam, W, H, 3))()

    for tile in (16, 32):
        bins = jax.jit(lambda pg: bin_gaussians(pg, W, H, BUDGET, tile))(pg)
        nx, ny = tile_grid(W, H, tile)
        counts = (bins.ends - bins.starts)
        chunks = int(jnp.sum(-(-counts // 128)))
        print(f"tile{tile}: inst={int(bins.n_instances)} "
              f"aligned={int(bins.aligned_total)} tiles={nx*ny} "
              f"chunks={chunks} instpix={chunks*128*tile*tile/1e6:.1f}M",
              flush=True)

    # op-level: the scatter+cummax flood fills over budget-size arrays
    slot = jnp.arange(BUDGET, dtype=jnp.int32)
    offs = jnp.sort(jax.random.randint(jax.random.PRNGKey(0), (N,), 0,
                                       BUDGET))
    vals = jnp.arange(N, dtype=jnp.int32)
    f1 = jax.jit(lambda o, v: jnp.zeros(BUDGET, jnp.int32).at[o].max(
        v, mode="drop"))
    print("scatter_max 50k->262k", timed(f1, offs, vals), "ms", flush=True)
    marks = f1(offs, vals)
    f2 = jax.jit(jax.lax.cummax)
    print("cummax 262k", timed(f2, marks), "ms", flush=True)
    f3 = jax.jit(lambda x: jnp.cumsum(x))
    print("cumsum 262k i32", timed(f3, marks), "ms", flush=True)
    # 2D-layout cummax alternative: (8, 32768) shape
    m2 = marks.reshape(8, -1)
    f4 = jax.jit(lambda x: jax.lax.cummax(x, axis=1))
    print("cummax (8,32768) rowwise", timed(f4, m2), "ms", flush=True)
    # scatter of 262k values into 327k (the gauss_al build)
    big = jax.random.permutation(jax.random.PRNGKey(1), BUDGET + 128 * 2048)
    idx = big[:BUDGET].astype(jnp.int32)
    f5 = jax.jit(lambda i, v: jnp.zeros(BUDGET + 128 * 2048,
                                        jnp.int32).at[i].set(v, mode="drop"))
    print("scatter_set 262k->589k", timed(f5, idx, vals[:1] * 0 + slot),
          "ms", flush=True)
    # searchsorted
    tids = jnp.arange(510, dtype=jnp.int32)
    keys = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (BUDGET,),
                                       0, 510))
    f6 = jax.jit(lambda k, t: jnp.searchsorted(k, t))
    print("searchsorted 510 in 262k", timed(f6, keys, tids), "ms",
          flush=True)


if __name__ == "__main__":
    main()
