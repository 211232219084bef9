"""Multi-host layer (hugs_tpu/parallel/multihost.py).

Single-process pieces run on the 8-virtual-device CPU mesh; the
multi-process path (jax.distributed + Gloo CPU collectives) is driven
end-to-end in a 2-process subprocess smoke test.
"""
import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hugs_tpu.parallel.multihost import make_hybrid_mesh, global_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # 8-device shard_map compiles dominate suite time


def test_hybrid_mesh_single_process():
    mesh = make_hybrid_mesh(n_tile=4)
    assert dict(mesh.shape) == {"data": 2, "tile": 4}
    with pytest.raises(ValueError):
        make_hybrid_mesh(n_tile=3)


def test_global_batch_single_process():
    mesh = make_hybrid_mesh(n_tile=4)
    batch = {"x": np.arange(12, dtype=np.float32).reshape(2, 6),
             "s": np.float32(3.0)}
    g = global_batch(batch, mesh, P("data"))
    assert g["x"].shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    # sharded over 'data'
    assert g["x"].sharding.spec == P("data")


_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    from hugs_tpu.parallel.multihost import (init_distributed,
                                             make_hybrid_mesh, global_batch)
    assert init_distributed()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rank = jax.process_index()
    mesh = make_hybrid_mesh()          # (data=2, tile=2)
    assert dict(mesh.shape) == {{"data": 2, "tile": 2}}
    local = {{"x": np.full((1, 4), rank + 1.0, np.float32)}}
    g = global_batch(local, mesh, P("data"))

    def f(x):
        return jax.lax.psum(jnp.sum(x), ("data", "tile"))

    out = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P(),
                    check_vma=False)(g["x"])
    # rows: rank0 -> 4*1, rank1 -> 4*2; each row seen by 2 tile chips
    # is split over... x sharded over data only: each data row holds the
    # full (1,4); psum over both axes counts each row n_tile times / but
    # the row is SHARDED over data and replicated over tile, so the
    # local summand per chip is its data row's full 4 elements -> psum
    # = n_tile * (4*1 + 4*2) = 2 * 12 = 24
    val = float(np.asarray(jax.device_get(out)))
    assert val == 24.0, val
    print(f"rank {{rank}} OK", flush=True)
""")


def test_two_process_gloo_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["HUGS_COORDINATOR"] = "localhost:23997"
    env["HUGS_NUM_PROCESSES"] = "2"
    env.pop("TPU_WORKER_HOSTNAMES", None)
    env.pop("MEGASCALE_COORDINATOR_ADDRESS", None)
    procs = []
    for r in range(2):
        e = dict(env, HUGS_PROCESS_ID=str(r))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"rank {r} OK" in out


def test_enable_overlap_flags(tmp_path):
    """Overlap flags: appended once before backend init on a TPU-bound
    process; refused after init or under a pinned non-TPU platform."""
    script = tmp_path / "flags.py"
    script.write_text(f"""
import os, sys
sys.path.insert(0, {REPO!r})
from hugs_tpu.parallel.multihost import (enable_overlap_flags,
                                         OVERLAP_XLA_FLAGS)
# pinned-CPU process: no-op (the CPU XLA client aborts on xla_tpu flags)
os.environ["JAX_PLATFORMS"] = "cpu"
assert enable_overlap_flags() is False
assert "latency_hiding" not in os.environ.get("XLA_FLAGS", "")
# TPU-bound process (platform unpinned): flags land, idempotently
del os.environ["JAX_PLATFORMS"]
assert enable_overlap_flags() is True
assert enable_overlap_flags() is True
flags = os.environ["XLA_FLAGS"]
for f in OVERLAP_XLA_FLAGS:
    assert flags.count(f) == 1, f
# after the backend exists the helper refuses (flags would be ignored)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.devices()
del os.environ["JAX_PLATFORMS"]
assert enable_overlap_flags() is False
print("flags OK")
""")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, timeout=120)
    assert out.returncode == 0, out.stdout.decode() + out.stderr.decode()
    assert "flags OK" in out.stdout.decode()
