"""Test configuration.

Tests run on local CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4.4). The ambient environment registers
the 'axon' TPU-tunnel PJRT plugin at interpreter startup (sitecustomize)
and routes compilation through a remote relay, which makes every jit take
seconds; the plugin is keyed on PALLAS_AXON_POOL_IPS, so when we detect it
we re-exec pytest once with that unset and JAX_PLATFORMS=cpu.
"""
import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("HUGS_TPU_TEST_REEXEC") != "1"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["HUGS_TPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the CPU test runs: the suite's cost
# is dominated by XLA compiles of the 8-device shard_map graphs (the
# sharding/gauss-shard parity tests run minutes of compile on tiny
# scenes). First run pays; reruns hit the cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
