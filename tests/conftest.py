"""Test configuration.

Tests run on local CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4.4). The ambient environment registers
the 'axon' TPU-tunnel PJRT plugin at interpreter startup (sitecustomize,
keyed on PALLAS_AXON_POOL_IPS) and routes compilation through a remote
relay (minutes per compile). sitecustomize has already imported jax by
the time this conftest runs, but the BACKEND only initializes on first
use, so forcing cpu via jax.config here still works — and unlike the
previous re-exec approach it doesn't lose pytest's output (pytest's
fd-level capture has already replaced fd 1 when conftests load, so an
execve'd pytest writes its whole report into a dead temp file).
The env mutations below are inherited by subprocesses the tests spawn
(multihost simulation), keeping children off the relay too.
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # children: no axon plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # this process: post-import
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the CPU test runs: the suite's cost
# is dominated by XLA compiles of the 8-device shard_map graphs (the
# sharding/gauss-shard parity tests run minutes of compile on tiny
# scenes). First run pays; reruns hit the cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
