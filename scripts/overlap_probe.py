"""Probe: does this TPU backend accept the collective-overlap XLA flags?

`multihost.enable_overlap_flags()` appends --xla_tpu_enable_latency_
hiding_scheduler etc. before backend init; unknown flags abort some XLA
clients, so this must be verified once on the real backend before any
launcher enables them by default. Prints ACCEPTED/REJECTED.

Run (default TPU env): timeout 900 python scripts/overlap_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hugs_tpu.parallel.multihost import enable_overlap_flags  # noqa: E402

applied = enable_overlap_flags()
print("flags applied:", applied, flush=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import json  # noqa: E402

out = {"flags_applied": applied}
try:
    dev = jax.devices()[0]
    val = float(jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones(256)))
    assert val == 768.0, val
    out.update(status="ACCEPTED", platform=dev.platform, jit_result=val)
    print(f"ACCEPTED on {dev.platform}: jit result {val}", flush=True)
    code = 0
except Exception as e:  # noqa: BLE001
    out.update(status="REJECTED", error=f"{type(e).__name__}: {e}")
    print(f"REJECTED: {type(e).__name__}: {e}", flush=True)
    code = 1
with open(os.path.join(os.path.dirname(__file__), "..", "evidence",
                       "overlap_probe.json"), "w") as f:
    json.dump(out, f, indent=1)
sys.exit(code)
