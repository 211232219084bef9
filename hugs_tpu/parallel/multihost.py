"""Multi-host (pod-slice) entry path and DCN-aware mesh construction.

The reference framework is strictly single-GPU/single-process
(SURVEY.md §2.3) — this is new TPU-native capability. A TPU pod slice
runs one process per host; chips within a host (and across the slice's
ICI fabric) talk over ICI, while processes on different hosts without a
shared ICI domain talk over DCN (data-center network, ~10-100x lower
bandwidth). The mesh layout rule (scaling-book recipe) is therefore:

  - put the 'tile' axis (band-sharded rasterization: per-step
    all_gather of image bands + fused grad all-reduce) INSIDE a host,
    riding ICI;
  - put the 'data' axis (frame parallelism: only the end-of-step grad
    all-reduce crosses it) across hosts, riding DCN.

`jax.experimental.mesh_utils.create_hybrid_device_mesh` encodes exactly
this: the inner `mesh_shape` is laid out over ICI-connected devices and
the outer `dcn_mesh_shape` over process granules.

Single-process use (1 host, N chips — or the CPU test mesh) needs no
initialization and `make_hybrid_mesh` degenerates to a plain mesh, so
all call sites can be written once against this module and run
unchanged from a laptop CPU to a pod slice.

Multi-process CPU simulation (used by scripts/scaling_bench.py and the
multi-host tests) launches N processes with
`XLA_FLAGS=--xla_force_host_platform_device_count=K JAX_PLATFORMS=cpu`;
jax's Gloo-backed CPU collectives make psum/all_gather work across
processes, so the full multi-host code path is exercised without TPU
hardware.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the JAX distributed runtime for multi-process runs.

    Call ONCE at program start, before any other jax API touches the
    backend. Arguments default from the environment:

      HUGS_COORDINATOR / JAX_COORDINATOR_ADDRESS  host:port of process 0
      HUGS_NUM_PROCESSES                          world size
      HUGS_PROCESS_ID                             this process's rank

    On a real TPU pod slice all three may be omitted entirely —
    `jax.distributed.initialize()` auto-detects from the TPU metadata
    (this is how a pod run "just works" with no flags). Returns True if
    the distributed runtime was (or already is) initialized, False for
    plain single-process runs with no configuration present.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "HUGS_COORDINATOR") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("HUGS_NUM_PROCESSES"):
        num_processes = int(os.environ["HUGS_NUM_PROCESSES"])
    if process_id is None and os.environ.get("HUGS_PROCESS_ID"):
        process_id = int(os.environ["HUGS_PROCESS_ID"])
    on_tpu_pod = (os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


OVERLAP_XLA_FLAGS = (
    # Latency-hiding scheduler: lets XLA start a gradient all-reduce as
    # soon as its producing subgraph finishes, overlapping collectives
    # with the remaining backward tile pass (the north-star "grad
    # all-reduce overlapped with backward" — BASELINE.json). The sharded
    # steps psum per-LEAF (train_dp_tile.py:206, one all-reduce per
    # parameter group), so each reduce is independently schedulable; this
    # flag turns that freedom into actual overlap on TPU.
    "--xla_tpu_enable_latency_hiding_scheduler=true",
    # allow collectives to run async on their own stream
    "--xla_tpu_enable_async_collective_fusion=true",
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
)


def enable_overlap_flags() -> bool:
    """Append the collective-overlap XLA flags to XLA_FLAGS.

    Must run BEFORE jax initializes its backend (like
    init_distributed). The flags are TPU-backend-only (the CPU XLA
    client aborts on unknown --xla_tpu_* flags), so this is a no-op
    when JAX_PLATFORMS pins a non-TPU backend. Returns False (and
    changes nothing) if the backend is already initialized or a
    non-TPU platform is pinned.
    """
    platforms = os.environ.get("JAX_PLATFORMS", "").lower()
    # 'axon' is this environment's TPU-tunnel PJRT plugin (its devices
    # report platform 'tpu'); unpinned means TPU autodetect may win
    if platforms and "tpu" not in platforms and "axon" not in platforms:
        return False
    import jax._src.xla_bridge as xb
    if getattr(xb, "_backends", None):
        return False
    cur = os.environ.get("XLA_FLAGS", "")
    missing = [f for f in OVERLAP_XLA_FLAGS if f not in cur]
    if not missing:
        return True
    os.environ["XLA_FLAGS"] = (cur + " " + " ".join(missing)).strip()
    return True


def make_hybrid_mesh(n_tile: int | None = None,
                     axis_names=("data", "tile")) -> Mesh:
    """('data', 'tile') mesh: 'tile' within a host (ICI), 'data' across
    hosts (DCN) x leftover in-host devices.

    n_tile defaults to all of a host's local devices (pure data
    parallelism across hosts). Requires n_tile to divide the local
    device count. With one process this is a plain single-granule mesh.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if n_tile is None:
        n_tile = n_local
    if n_local % n_tile:
        raise ValueError(
            f"n_tile={n_tile} must divide local device count {n_local}")
    ici_data = n_local // n_tile
    if n_proc == 1:
        devs = mesh_utils.create_device_mesh((ici_data, n_tile))
        return Mesh(devs, axis_names)
    try:
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, n_tile),
            dcn_mesh_shape=(n_proc, 1))
    except ValueError:
        # devices without distinct slice_index attrs (the CPU simulation;
        # also single-ICI-domain topologies): group by process instead —
        # same layout, outermost 'data' dim = process granule
        devs = sorted(jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        devs = np.array(devs).reshape(n_proc * ici_data, n_tile)
    return Mesh(devs, axis_names)


def global_batch(local_batch, mesh: Mesh, spec: P = P("data")):
    """Assemble a global jax.Array batch from per-process local data.

    Each process passes ITS frames (shape [local_n, ...]); the result is
    a global array of shape [sum local_n, ...] sharded per `spec`, ready
    to feed a shard_map'd train step. Pytree-aware. Single-process this
    is just device_put with the sharding (the data-loading code is thus
    identical on 1 host and N hosts).
    """
    def one(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec if x.ndim else P())
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)
    return jax.tree.map(one, local_batch)


def sync_hosts(name: str = "sync") -> None:
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() > 1:
        import jax.experimental.multihost_utils as mh
        mh.sync_global_devices(name)
