"""utils/profiling.py: step timer, profiler trace ctx, debug-nans guard
(SURVEY §5 auxiliary subsystems — absent in the reference)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugs_tpu.utils import profiling


def test_step_timer_ema():
    t = profiling.StepTimer(ema=0.5)
    for _ in range(3):
        with t:
            pass
    assert t.avg_s is not None and t.avg_s >= 0.0
    assert t.steps_per_s > 0.0


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    with profiling.trace(logdir):
        profiling.block(jnp.ones(128).sum())
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "no profile artifacts written"


def test_debug_nans_catches():
    profiling.enable_debug_nans(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.zeros(4)).block_until_ready()
    finally:
        profiling.enable_debug_nans(False)


def test_block_returns_tree():
    tree = {"a": jnp.arange(4), "b": (jnp.ones(2),)}
    out = profiling.block(tree)
    assert np.asarray(out["a"]).sum() == 6
