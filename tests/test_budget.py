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


def _tiny_render(budget, backend="tiled"):
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
        tile_cap=128, instance_budget=budget, backend=backend)


def test_render_reports_n_instances():
    big = _tiny_render(4096)
    assert int(big["n_instances"]) > 0
    assert not bool(big["overflowed"])
    # identical scene through a too-small budget: same true count, flagged
    small = _tiny_render(128)
    assert int(small["n_instances"]) == int(big["n_instances"])
    assert bool(small["overflowed"])


def test_slot_demand_and_alignment_overflow():
    """Alignment waste counts against the budget (tiles.bin_gaussians
    sizes its array to the budget itself — the old budget + ALIGN*T
    slack cost ~0.9 ms/step of index-bound padding tax): a pallas-layout
    budget that covers the instances but not the 128-aligned segments
    must flag overflow, and n_slots must report the true demand."""
    big = _tiny_render(4096, backend="pallas")
    n_inst = int(big["n_instances"])
    n_slots = int(big["n_slots"])
    assert not bool(big["overflowed"])
    # 64x48 at tile=32 is a 2x2 tile grid: multiple non-empty 128-aligned
    # segments make the slot demand strictly exceed the instance count
    assert n_slots > n_inst
    # a budget covering the instances but not the aligned layout: flagged
    tight_budget = -(-n_inst // 128) * 128
    assert tight_budget < n_slots
    tight = _tiny_render(tight_budget, backend="pallas")
    assert bool(tight["overflowed"])
    # at the reported slot demand nothing overflows and the image matches
    ok = _tiny_render(-(-n_slots // 128) * 128, backend="pallas")
    assert not bool(ok["overflowed"])
    assert int(ok["n_instances"]) == n_inst
    np.testing.assert_allclose(np.asarray(ok["render"]),
                               np.asarray(big["render"]), atol=1e-6)


def test_pallas_overflow_tables_stay_in_bounds():
    """An overflowed pallas frame is garbage-but-safe: the clamped
    per-tile tables keep every kernel DMA inside the budget-sized
    instance array (the frame is discarded and retried by the trainer,
    but the kernel must not read out of bounds getting there)."""
    small = _tiny_render(128, backend="pallas")
    assert bool(small["overflowed"])
    img = np.asarray(small["render"])
    assert np.isfinite(img).all()
    big = _tiny_render(4096, backend="pallas")
    assert int(small["n_instances"]) == int(big["n_instances"])


def test_tiled_backend_dense_layout_no_alignment_waste():
    """The XLA tiled backend bins with align=1: slot demand == instance
    count, and a budget of exactly n_instances suffices."""
    from hugs_tpu.render import render, make_camera
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.7)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    n = 64
    means = jax.random.uniform(ks[0], (n, 3), minval=-1,
                               maxval=1).at[:, 2].add(4.0)
    args = (means,
            jnp.exp(jax.random.normal(ks[1], (n, 3)) * 0.2 - 2.2),
            jax.random.normal(ks[2], (n, 4)),
            jax.nn.sigmoid(jax.random.normal(ks[3], (n,))),
            jax.random.normal(ks[4], (n, 16, 3)) * 0.25)
    kw = dict(camera=cam, width=64, height=48, active_sh_degree=3,
              tile_cap=128, backend="tiled")
    big = render(*args, instance_budget=4096, **kw)
    assert int(big["n_slots"]) == int(big["n_instances"])
    exact = render(*args, instance_budget=int(big["n_instances"]), **kw)
    assert not bool(exact["overflowed"])
    np.testing.assert_allclose(np.asarray(exact["render"]),
                               np.asarray(big["render"]), atol=1e-6)


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
