"""Probe: does this TPU backend accept the collective-overlap XLA flags?

`multihost.enable_overlap_flags()` appends --xla_tpu_enable_latency_
hiding_scheduler etc. before backend init. Unknown flags make some XLA
clients log an F-level fatal and ABORT THE PROCESS (no catchable Python
exception), so the check runs in a SUBPROCESS: the child applies the
flags and jits a trivial function; the parent interprets exit
status/output and records ACCEPTED/REJECTED in
evidence/overlap_probe.json. `scripts/scaling_bench.py worker` enables
the flags by default only on a recorded ACCEPTED — a pod launcher must
never discover an abort live.

Run (default TPU env): timeout 900 python scripts/overlap_probe.py
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, %r)
from hugs_tpu.parallel.multihost import enable_overlap_flags
applied = enable_overlap_flags()
print("flags applied:", applied, flush=True)
if not applied:
    sys.exit(3)
import jax, jax.numpy as jnp
dev = jax.devices()[0]
val = float(jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones(256)))
assert val == 768.0, val
print(f"child ok on {dev.platform}: {val}", flush=True)
""" % REPO


def main():
    proc = subprocess.run([sys.executable, "-c", CHILD], cwd=REPO,
                          capture_output=True, text=True, timeout=840)
    tail = (proc.stdout + proc.stderr).strip().splitlines()[-6:]
    out = {"child_exit": proc.returncode, "child_tail": tail}
    if proc.returncode == 0:
        out["status"] = "ACCEPTED"
    elif proc.returncode == 3:
        out["status"] = "NOT_APPLIED"   # non-TPU platform pinned
    else:
        out["status"] = "REJECTED"     # backend aborted / flag error
        out["note"] = ("this client hard-aborts (F-level fatal in "
                       "parse_flags_from_env) on the --xla_tpu_* flags; "
                       "exactly the failure a launcher must not hit "
                       "live. Re-probe once per backend image — a real "
                       "pod libtpu build may accept them.")
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "evidence", "overlap_probe.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    return 0 if out["status"] == "ACCEPTED" else 1


if __name__ == "__main__":
    sys.exit(main())
