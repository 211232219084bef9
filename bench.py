"""Benchmark: differentiable splat render fwd+bwd throughput (pixels/s/chip).

Matches BASELINE.json config[0]: scene-only 3DGS, ~50k Gaussians, 540p
(960x540) single frame, forward + backward. Runs on whatever jax.devices()
provides (the real TPU chip under the driver; CPU locally with
JAX_PLATFORMS=cpu).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against an estimated CUDA diff-gaussian-
rasterization fwd+bwd throughput on an A100 at the same workload
(~100 iters/s x 518,400 px = 5.2e7 px/s; the reference publishes no
numbers — BASELINE.md — so this is the documented stand-in).

Timing methodology: K data-chained steps inside ONE jitted lax.fori_loop
(the scripts/micro_loop.py method), best of several blocks. Per-call
dispatch in this environment crosses a remote TPU-tunnel relay and costs
~1-3 ms of host latency that no real TPU deployment pays; chaining
measures the device, and best-of-blocks rides out the shared chip's
~1.5x run-to-run clock swing. Each step is still a full fwd+bwd with a
sequential data dependency on the previous one (XLA can neither elide
nor overlap steps).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the remote-compile relay takes minutes for
# the full graph; cache hits make repeat bench runs start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, H = 960, 540
N_GAUSS = 50_000
BASELINE_PX_S = 5.2e7
ITERS = 10   # chained steps per jitted block
BLOCKS = 12  # timed blocks; report the best. The shared chip's clock
#              swings ~1.5x run-to-run on a timescale of seconds, so
#              sampling more ~0.2 s blocks (total cost ~2.5 s) makes the
#              best-of estimate far more likely to catch a full-clock
#              window; 5 blocks measurably under-reported on slow runs.


def build_scene(n, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-2.0, maxval=2.0)
    means = means.at[:, 2].set(means[:, 2] * 1.5 + 5.0)
    log_scales = jax.random.normal(ks[1], (n, 3)) * 0.3 - 4.0
    rotq = jax.random.normal(ks[2], (n, 4))
    opacity_logit = jax.random.normal(ks[3], (n,))
    shs = jax.random.normal(ks[4], (n, 16, 3)) * 0.3
    return means, log_scales, rotq, opacity_logit, shs


def main():
    from hugs_tpu.render import render, make_camera

    backend = os.environ.get("HUGS_BENCH_BACKEND", "pallas")
    tile_s = os.environ.get("HUGS_BENCH_TILE", "32")
    tile = tuple(int(x) for x in tile_s.split("x")) if "x" in tile_s \
        else int(tile_s)
    params = build_scene(N_GAUSS)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.55)
    target = jax.random.uniform(jax.random.PRNGKey(9), (3, H, W))
    bg = jnp.zeros(3)

    def loss_fn(params):
        m, ls, q, ol, c = params
        img = render(m, jnp.exp(ls),
                     q / jnp.linalg.norm(q, axis=-1, keepdims=True),
                     jax.nn.sigmoid(ol), c, camera=cam, width=W, height=H,
                     bg=bg, active_sh_degree=3, backend=backend,
                     tile_cap=1024, instance_budget=131072,
                     tile=tile)["render"]
        return jnp.mean(jnp.abs(img - target))

    @jax.jit
    def block(params):
        def body(_, p):
            g = jax.grad(loss_fn)(p)
            # tiny chained update: forces step i+1 to depend on step i's
            # gradients without changing the workload numerically
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
        return jax.lax.fori_loop(0, ITERS, body, params)

    t0 = time.time()
    out = block(params)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(BLOCKS):
        t0 = time.time()
        out = block(params)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    dt = best / ITERS

    px_s = W * H / dt
    result = {
        "metric": f"splat_render_fwd_bwd_pixels_per_s ({backend}, "
                  f"{N_GAUSS // 1000}k gauss, {W}x{H}, "
                  f"{jax.devices()[0].platform})",
        "value": round(px_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(px_s / BASELINE_PX_S, 4),
    }
    print(json.dumps(result))
    print(f"# step={dt*1e3:.1f}ms compile={compile_s:.1f}s "
          f"iters/s={1/dt:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
