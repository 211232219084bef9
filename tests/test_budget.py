"""Instance-budget auto-sizing: bucket math, n_instances plumbing, and
trainer grow-and-retry on overflow (VERDICT r1 item 2; reference CUDA
binning always allocates the exact duplicate count — gs_renderer path —
so the static-budget design must never silently drop instances)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hugs_tpu.train.trainer import _budget_bucket


def test_budget_bucket_math():
    assert _budget_bucket(0) == 1 << 16
    assert _budget_bucket(1000) == 1 << 16
    # 1.25x headroom, rounded to 32768 multiples
    assert _budget_bucket(100_000) == 131072
    assert _budget_bucket(119_218) == 163840
    assert _budget_bucket(210_000) == 294912
    # monotone
    prev = 0
    for n in range(0, 400_000, 7919):
        b = _budget_bucket(n)
        assert b >= max(n, prev) and b % 32768 == 0 or b == 1 << 16
        prev = b


def _tiny_render(budget):
    from hugs_tpu.render import render, make_camera
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    n = 64
    means = jax.random.uniform(ks[0], (n, 3), minval=-1,
                               maxval=1).at[:, 2].add(4.0)
    return render(
        means, jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.2 - 2.2),
        jax.random.normal(ks[2], (n, 4)),
        jax.nn.sigmoid(jax.random.normal(ks[3], (n,))),
        jax.random.normal(ks[4], (n, 16, 3)) * 0.25,
        camera=cam, width=64, height=48, active_sh_degree=3,
        tile_cap=128, instance_budget=budget)


def test_render_reports_n_instances():
    big = _tiny_render(4096)
    assert int(big["n_instances"]) > 0
    assert not bool(big["overflowed"])
    # identical scene through a too-small budget: same true count, flagged
    small = _tiny_render(128)
    assert int(small["n_instances"]) == int(big["n_instances"])
    assert bool(small["overflowed"])


def test_trainer_grows_budget_on_overflow(tmp_path):
    from hugs_tpu.cfg import default_config
    from hugs_tpu.train.trainer import GaussianTrainer

    cfg = default_config()
    cfg.mode = "scene"
    cfg.train.num_steps = 4
    cfg.scene.densify_from_iter = 10_000
    cfg.tpu.scene_capacity = 256
    cfg.tpu.tile_cap = 256
    cfg.tpu.instance_budget = 0  # auto
    cfg.logdir = ""
    cfg.logdir_ckpt = ""

    class _Frames:
        # enough points that 128 instances overflow (the trainer's
        # datasetless placeholder is deliberately tiny since r4's
        # evaluate.py fix, so the pcd must come from the dataset)
        init_pcd = (
            np.random.RandomState(0).uniform(
                -3, 3, (256, 3)).astype(np.float32) + [0, 0, 4],
            np.full((256, 3), 0.5, np.float32))
        radius = 4.0

        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            import numpy as _np
            from hugs_tpu.render import make_camera
            cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
            return {"camera": cam,
                    "rgb": _np.full((3, 32, 48), 0.5, _np.float32),
                    "mask": _np.ones((32, 48), _np.float32),
                    "width": 48, "height": 32}

    tr = GaussianTrainer(cfg, _Frames(4), None, None)
    assert not tr._ibudget_fixed
    # force an undersized budget; the first step must overflow, grow, and
    # retry rather than committing a degraded update
    tr._ibudget = 128
    log = tr.train()
    assert tr._ibudget >= 1 << 16
    assert np.isfinite([e["loss"] for e in log]).all()
