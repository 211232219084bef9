"""Hardware parity check of the Pallas blend kernels vs the f32 XLA
tiled backend, on scenes that force the kernel's edge paths (VERDICT r1
item 7): >2 chunks per tile, empty subtiles, tile=16, budget-boundary
segments, saturation early-out, and gradients end-to-end.

Interpret-mode CI covers the same cases (tests/test_pallas_blend.py);
this script is the on-chip record: real Mosaic compilation, real DMA.

Run (default TPU env):
    PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3000 \
        python scripts/kernel_parity_tpu.py > /tmp/kparity.log 2>&1 &

Writes evidence/kernel_parity_tpu.json.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def make_scene(n, seed, spread=1.0, z_span=2.0, op_hi=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-spread, maxval=spread)
    means = means.at[:, 2].set(means[:, 2] * z_span / spread + 4.0)
    scales = jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.3 - 2.5)
    rotq = jax.random.normal(ks[2], (n, 4))
    rotq /= jnp.linalg.norm(rotq, axis=-1, keepdims=True)
    op = jax.random.normal(ks[3], (n,))
    opacity = jax.nn.sigmoid(op + (2.5 if op_hi else 0.0))
    shs = jax.random.normal(ks[4], (n, 16, 3)) * 0.3
    return means, scales, rotq, opacity, shs


def run_case(name, n, seed, W, H, tile, budget, op_hi=False, spread=0.35,
             power_mxu=False, tight=False):
    from hugs_tpu.render import render, make_camera
    from hugs_tpu.render.project import project_gaussians
    from hugs_tpu.render.tiles import bin_gaussians

    means, scales, rotq, opacity, shs = make_scene(
        n, seed, spread=spread, op_hi=op_hi)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
    bg = jnp.array([0.2, 0.3, 0.4])

    # chunk-structure stats for the record; tight=True re-sizes the
    # budget to the EXACT pallas slot demand (the aligned layout ends
    # flush with the array — the budget-boundary case; alignment waste
    # counts against the budget, so "barely fits" is n_slots, not
    # n_instances)
    pg = project_gaussians(means, scales, rotq, opacity, shs, cam, W, H,
                           active_sh_degree=3)
    bins = bin_gaussians(pg, W, H, budget, tile)
    if tight:
        budget = -(-int(bins.n_slots) // 128) * 128
        bins = bin_gaussians(pg, W, H, budget, tile)
        assert not bool(bins.overflowed)
    kw = dict(camera=cam, width=W, height=H, bg=bg, active_sh_degree=3,
              instance_budget=budget, tile=tile)
    counts = np.asarray(bins.ends) - np.asarray(bins.starts)
    chunks = -(-counts // 128)
    stats = {"max_chunks_per_tile": int(chunks.max()),
             "empty_tiles": int((counts == 0).sum()),
             "tiles": int(counts.shape[0]),
             "n_instances": int(bins.n_instances),
             "overflowed": bool(bins.overflowed)}

    target = jax.random.uniform(jax.random.PRNGKey(7), (3, H, W))

    # tile_cap must not exceed the aligned instance array (the tiled
    # backend's dynamic_slice would clamp its start and read the wrong
    # segment); it only needs to cover the largest per-tile count.
    cap = min(4096, budget // 2)

    def loss(backend, m, s, q, o, c):
        img = render(m, s, q, o, c, backend=backend, tile_cap=cap,
                     power_mxu=power_mxu, **kw)["render"]
        return jnp.mean(jnp.abs(img - target)), img

    vg = jax.value_and_grad(lambda be, *a: loss(be, *a)[0], argnums=(1, 2, 3, 4, 5), has_aux=False)
    img_t = jax.jit(lambda *a: loss("tiled", *a)[1])(
        means, scales, rotq, opacity, shs)
    img_p = jax.jit(lambda *a: loss("pallas", *a)[1])(
        means, scales, rotq, opacity, shs)
    d_img = float(jnp.max(jnp.abs(img_t - img_p)))

    gt = jax.jit(lambda *a: vg("tiled", *a))(means, scales, rotq, opacity, shs)[1]
    gp = jax.jit(lambda *a: vg("pallas", *a))(means, scales, rotq, opacity, shs)[1]
    d_grad = {}
    for pname, a, b in zip(["means", "scales", "rotq", "opacity", "shs"],
                           gt, gp):
        num = float(jnp.max(jnp.abs(a - b)))
        den = float(jnp.max(jnp.abs(a)) + 1e-12)
        d_grad[pname] = num / den
    case = {"case": name, "W": W, "H": H, "tile": tile, "n": n,
            "power_mxu": power_mxu,
            **stats, "max_abs_dimg": d_img, "rel_dgrad": d_grad}
    print(json.dumps(case), flush=True)
    return case


def main():
    cases = []
    for pmx in (False, True):   # exact-VPU path and MXU alpha-quadratic
        cases += [
            # >2 chunks/tile + empty subtiles: dense cluster in one corner
            run_case("multichunk_empty", n=3000, seed=0, W=128, H=96,
                     tile=32, budget=65536, spread=0.25, power_mxu=pmx),
            # saturation early-out: near-opaque overlapping splats
            run_case("saturating", n=2000, seed=1, W=128, H=96,
                     tile=32, budget=65536, op_hi=True, spread=0.3,
                     power_mxu=pmx),
            # tile=16 path (P=256; MXU mode: padded K=24->32 basis)
            run_case("tile16", n=1500, seed=2, W=96, H=64,
                     tile=16, budget=65536, spread=0.4, power_mxu=pmx),
            # budget-boundary: budget == exact slot demand (layout
            # ends flush with the instance array)
            run_case("tight_budget", n=800, seed=3, W=96, H=64,
                     tile=32, budget=65536, spread=0.6, power_mxu=pmx,
                     tight=True),
        ]
    ok = all(c["max_abs_dimg"] < 5e-5 and
             max(c["rel_dgrad"].values()) < 5e-4 for c in cases)
    out = {"device": jax.devices()[0].platform, "pass": ok, "cases": cases}
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    with open(os.path.join(ev, "kernel_parity_tpu.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
