"""frag_cap packet-sizing measurement for Gaussian-sharded rendering
(VERDICT r4 item 4): at NeuMan-ish scale, how skewed are the
per-(sender, band) fragment packets, and how far below the worst-case
default (frag_cap = local_budget) can the exchange packet be sized?

The all_to_all exchange in parallel/gauss_shard.py moves D x D packets
of frag_cap rows x 10 f32 features (+3 int32 keys): packet bytes scale
linearly with frag_cap, so tightening it from the always-safe default
directly cuts ICI volume and the re-sort length. This measures the
ACTUAL per-pair maximum over orbiting cameras on a NeuMan-lab-statistics
scene (bg sphere + floor + boxes + a human-ish blob at the center — the
flagship workload's shape) and reports the measured sizing rule.

Runs on the 8-virtual-device CPU mesh (binning + exchange accounting is
identical on TPU; only the blend speed differs). Writes
evidence/gauss_frag_sizing.json.

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 1700 python scripts/gauss_frag_sizing.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from hugs_tpu.data.cameras import get_rotating_camera
    from hugs_tpu.ops.knn import mean_sq_dist_to_knn
    from hugs_tpu.parallel import make_mesh
    from hugs_tpu.parallel.gauss_shard import render_gauss_sharded

    W, H = 480, 272
    N = 1 << 16                       # 65,536 gaussians, 8,192/chip
    rng = np.random.RandomState(0)

    # NeuMan-lab shape: bg sphere + floor + obstacles + center blob
    u = rng.normal(size=(N // 2, 3))
    sph = 6.0 * u / np.linalg.norm(u, axis=1, keepdims=True)
    floor = np.stack([rng.uniform(-3, 3, N // 4),
                      np.full(N // 4, -1.2),
                      rng.uniform(-3, 3, N // 4)], axis=1)
    human = rng.normal(size=(N // 4, 3)) * [0.25, 0.8, 0.2]
    pts = np.concatenate([sph, floor, human]).astype(np.float32)[:N]
    rng.shuffle(pts)                  # contiguity = random (worst case
    #                                   for spatial shard locality)
    d2 = mean_sq_dist_to_knn(jnp.asarray(pts), k=3)
    scales = jnp.tile(jnp.sqrt(jnp.clip(d2, 1e-8))[:, None], (1, 3))
    rotq = jnp.tile(jnp.array([1.0, 0, 0, 0]), (N, 1))
    opacity = jnp.full(N, 0.8)
    shs = jnp.asarray(rng.rand(N, 16, 3).astype(np.float32) * 0.2)

    mesh = make_mesh(axis_names=("gauss",))
    D = mesh.shape["gauss"]
    local_budget = 16 * (N // D)   # roomy probe cap: sizing needs the
    #                                TRUE demand, not a clipped bound

    cams = get_rotating_camera(img_size=(H, W), fov=0.95, dist=3.0,
                               nframes=6)
    per_pair_max = 0
    per_band_max = 0
    mats = []
    for c in cams:
        out = render_gauss_sharded(
            pts, scales, rotq, opacity, shs, c["camera"], W, H, mesh,
            active_sh_degree=3, local_budget=local_budget,
            tile_cap=32768)
        fc = np.asarray(out["frag_counts"])        # (sender, band)
        assert not bool(out["overflowed"])
        per_pair_max = max(per_pair_max, int(fc.max()))
        per_band_max = max(per_band_max, int(fc.sum(axis=0).max()))
        mats.append(fc.tolist())

    mean_pair = float(np.mean([np.mean(m) for m in mats]))
    out = {
        "workload": f"{N} gaussians ({D}-chip shard, {N // D}/chip), "
                    f"{W}x{H}, 6 orbit cameras, NeuMan-lab shape "
                    f"(bg sphere + floor + human blob), shuffled rows",
        "local_budget_default": local_budget,
        "frag_cap_default": local_budget,
        "measured_per_pair_max": per_pair_max,
        "measured_per_band_max": per_band_max,
        "mean_per_pair": round(mean_pair, 1),
        "skew_max_over_mean": round(per_pair_max / max(mean_pair, 1), 2),
        "sizing_rule": "frag_cap = next_pow2(measured_per_pair_max * 1.5)"
                       " from a rehearsal pass (same probe machinery as "
                       "the instance budget, trainer.rehearse_budget); "
                       "overflow is reported, never silent",
        "frag_cap_recommended": int(2 ** np.ceil(np.log2(
            max(per_pair_max * 3 // 2, 1)))),
        "bytes_per_pair_default": local_budget * (10 * 4 + 3 * 4),
        "bytes_per_pair_recommended": int(2 ** np.ceil(np.log2(
            max(per_pair_max * 3 // 2, 1)))) * (10 * 4 + 3 * 4),
        "frag_counts_per_camera": mats,
    }
    ev = os.path.join(os.path.dirname(__file__), "..", "evidence")
    with open(os.path.join(ev, "gauss_frag_sizing.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "frag_counts_per_camera"}), flush=True)


if __name__ == "__main__":
    main()
