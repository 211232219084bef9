"""Multi-host scaling harness (SCALING.md numbers).

Measures the fully-sharded dp x tile joint train step
(hugs_tpu/parallel/train_dp_tile.py) across process counts:

  worker   — one process of the job: init the distributed runtime,
             build the DCN-aware hybrid mesh, run timed steps, rank 0
             prints one JSON line.
  launcher — spawn N workers locally with the CPU-simulation env
             (Gloo-backed CPU collectives), collect the JSON.

Real-pod usage is the same worker with no simulation env:
  python scripts/scaling_bench.py worker            # auto-detect pod
or per-host:
  HUGS_COORDINATOR=host0:1234 HUGS_NUM_PROCESSES=4 HUGS_PROCESS_ID=r \
  python scripts/scaling_bench.py worker

CPU simulation (no TPU pod in this environment):
  python scripts/scaling_bench.py launcher --procs 1 2 4

Weak scaling: per-process work is FIXED (each host trains its own
frames; 'tile' bands stay within the host), so ideal scaling = flat
step time as hosts are added; only the end-of-step gradient all-reduce
crosses DCN. NOTE the CPU simulation oversubscribes cores (procs x
local_devices threads on 4 cores), so absolute sim times inflate with
procs for compute reasons; the meaningful sim read-out is that the
multi-host path runs and the collective overhead stays small relative
to compute. Real DCN efficiency must come from a pod run.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    sys.path.insert(0, REPO)
    from hugs_tpu.parallel.multihost import (enable_overlap_flags,
                                             init_distributed,
                                             make_hybrid_mesh, global_batch,
                                             sync_hosts)
    # collective-overlap XLA flags: enabled by default ONLY once the
    # one-time on-backend probe recorded ACCEPTED (unknown flags abort
    # some XLA clients — a pod launcher must not find that out live).
    # Run scripts/overlap_probe.py once per backend image to refresh.
    probe = os.path.join(REPO, "evidence", "overlap_probe.json")
    try:
        with open(probe) as f:
            if json.load(f).get("status") == "ACCEPTED":
                enable_overlap_flags()
    except FileNotFoundError:
        pass
    init_distributed()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from hugs_tpu.losses.loss import HumanSceneLoss
    from hugs_tpu.parallel.train_dp_tile import make_dp_tile_train_step
    from hugs_tpu.render import make_camera
    from hugs_tpu.train.human_step import (init_human_train_state,
                                           make_human_lrs)
    from hugs_tpu.train.scene_step import (init_scene_train_state,
                                           make_scene_lrs)
    from hugs_tpu.train.joint_step import JointTrainState
    from hugs_tpu.cfg import default_config
    from __graft_entry__ import _build_models

    n_proc = jax.process_count()
    rank = jax.process_index()
    mesh = make_hybrid_mesh(n_tile=args.n_tile)
    n_data = mesh.shape["data"]
    local_frames = n_data // n_proc
    W, H = args.width, args.height

    key = jax.random.PRNGKey(0)
    cfg, h_params, h_state, fixed, scene = _build_models(
        key, verts_per_bone=args.verts_per_bone,
        human_capacity=args.capacity, scene_n=args.capacity,
        scene_capacity=args.capacity, triplane_res=32, n_features=8,
        n_frames=max(n_data, 1))
    jstate = JointTrainState(
        human=init_human_train_state(h_params, h_state),
        scene=init_scene_train_state(scene))
    loss_fn = HumanSceneLoss(l_l1_w=0.8, l_ssim_w=0.2, l_lbs_w=10.0,
                             l_humansep_w=0.0, use_patches=False)
    step = make_dp_tile_train_step(
        mesh, fixed, cfg, width=W, height=H, loss_fn=loss_fn,
        tile_cap=args.tile_cap, instance_budget=args.budget,
        tile=args.tile, backend=args.backend)

    dcfg = default_config()
    h_static, h_sched = make_human_lrs(dcfg.human.lr)
    s_static, s_sched = make_scene_lrs(dcfg.scene.lr, 1.0)

    # per-process local frames -> global batch over the 'data' axis
    rng = np.random.RandomState(1234 + rank)
    cams = [make_camera(jnp.eye(3),
                        jnp.array([0.1 * (rank * local_frames + i),
                                   0.2, 2.5]), 0.9, 0.9)
            for i in range(local_frames)]
    local = {
        "camera": jax.tree.map(lambda *xs: np.stack(xs), *cams),
        "target": rng.rand(local_frames, 3, H, W).astype(np.float32),
        "mask": (rng.rand(local_frames, H, W) > 0.3).astype(np.float32),
        "bg": np.ones((local_frames, 3), np.float32),
        "hbg": np.ones((local_frames, 3), np.float32),
        "scale": np.ones(local_frames, np.float32),
        "idx": (rank * local_frames
                + np.arange(local_frames)).astype(np.int32),
        "key": np.stack([np.asarray(jax.random.PRNGKey(7 + i))
                         for i in range(local_frames)]),
    }
    g = global_batch(local, mesh, P("data"))
    h_lr = jnp.float32(h_sched(0))
    s_lr = jnp.float32(s_sched(0))

    def run_one(js):
        js, aux = step(js, g["camera"], g["target"], g["mask"], g["bg"],
                       g["hbg"], g["scale"], g["idx"], g["key"],
                       h_lr, h_static, s_lr, s_static)
        return js, aux

    # Isolated collective timing: the step's one cross-device op is the
    # fused grad all-reduce (train_dp_tile.py psum over both axes). Time
    # the SAME payload (total trainable-param count) through chained
    # psums in one jit — per-device-distinct input so XLA cannot elide
    # the AllReduce — to split step time into communication vs compute
    # (VERDICT r4 item 6: the communication FRACTION is the honest
    # multi-host read-out on this box, not px/s).
    import jax.tree_util as jtu
    from jax import shard_map
    n_grad = sum(x.size for x in jtu.tree_leaves(
        (h_params, [scene.xyz, scene.features_dc, scene.features_rest,
                    scene.opacity, scene.scaling, scene.rotation]))) \
        + 2 * (h_params.xyz.shape[0] + scene.capacity)      # + hook
    n_dev = n_data * mesh.shape["tile"]
    rows_local = n_dev // n_proc
    payload = global_batch(
        (np.arange(rows_local * n_grad, dtype=np.float32).reshape(
            rows_local, n_grad) * 1e-6 + rank),
        mesh, P(("data", "tile")))
    K = args.iters

    def ar_worker(x):
        def body(_, y):
            return jax.lax.psum(y, ("data", "tile")) * (1.0 / n_dev)
        return jax.lax.fori_loop(0, K, body, x)

    ar = jax.jit(shard_map(
        ar_worker, mesh=mesh, in_specs=P(("data", "tile")),
        out_specs=P(("data", "tile")), check_vma=False))

    with mesh:
        jstate, aux = run_one(jstate)      # compile
        jax.block_until_ready(aux["loss"])
        sync_hosts("warmup")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            jstate, aux = run_one(jstate)
        jax.block_until_ready(aux["loss"])
        dt = (time.perf_counter() - t0) / args.iters

        out = jax.block_until_ready(ar(payload))   # compile
        t0 = time.perf_counter()
        out = jax.block_until_ready(ar(payload))
        ar_ms = (time.perf_counter() - t0) / K * 1e3

    if rank == 0:
        px = W * H * n_data
        print(json.dumps({
            "procs": n_proc, "mesh": dict(mesh.shape),
            "n_frames": n_data, "step_ms": round(dt * 1e3, 2),
            "px_per_s": round(px / dt), "backend": args.backend,
            "grad_allreduce_ms": round(ar_ms, 2),
            "grad_payload_mb": round(n_grad * 4 / 1e6, 2),
            "comm_fraction": round(ar_ms / (dt * 1e3), 4),
            "loss": float(aux["loss"]),
        }), flush=True)
    sync_hosts("done")


def launcher(args):
    results = []
    for n in args.procs:
        port = 23400 + n
        env_base = dict(os.environ)
        env_base["PALLAS_AXON_POOL_IPS"] = ""
        env_base["JAX_PLATFORMS"] = "cpu"
        # the axon sitecustomize sets TPU_WORKER_HOSTNAMES in this
        # (launcher) process; scrub pod-autodetect vars from the sim env
        for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
            env_base.pop(v, None)
        env_base["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.local_devices}")
        procs = []
        for r in range(n):
            env = dict(env_base)
            if n > 1:
                env["HUGS_COORDINATOR"] = f"localhost:{port}"
                env["HUGS_NUM_PROCESSES"] = str(n)
                env["HUGS_PROCESS_ID"] = str(r)
            cmd = [sys.executable, os.path.abspath(__file__), "worker",
                   "--width", str(args.width), "--height", str(args.height),
                   "--capacity", str(args.capacity),
                   "--budget", str(args.budget),
                   "--tile", str(args.tile), "--tile_cap", str(args.tile_cap),
                   "--n_tile", str(args.local_devices),
                   "--iters", str(args.iters), "--backend", args.backend,
                   "--verts_per_bone", str(args.verts_per_bone)]
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=REPO,
                stdout=subprocess.PIPE if r == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL if r else None))
        out, _ = procs[0].communicate(timeout=1200)
        for p in procs[1:]:
            p.wait(timeout=60)
        line = [l for l in out.decode().splitlines()
                if l.startswith("{")][-1]
        rec = json.loads(line)
        print(line, flush=True)
        results.append(rec)
    with open(os.path.join(REPO, "evidence", "scaling_sim.json"), "w") as f:
        json.dump(results, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("role", choices=["worker", "launcher"])
    ap.add_argument("--procs", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--budget", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--tile_cap", type=int, default=128)
    ap.add_argument("--n_tile", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--backend", default="tiled")
    ap.add_argument("--verts_per_bone", type=int, default=16)
    args = ap.parse_args()
    if args.role == "worker":
        worker(args)
    else:
        launcher(args)


if __name__ == "__main__":
    main()
