"""Batch>1 wiring (VERDICT r1 item 6 / BASELINE config 5):
  - trainer.animate at batch>1 == the per-frame loop, on one device and
    on a data-sharded CPU mesh;
  - trainer.train with train.batch_size > 1 through the dp x tile step;
  - the dp x tile step with a local batch axis (frames > data devices).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hugs_tpu.cfg import default_config
from hugs_tpu.data import NeumanDataset
from hugs_tpu.models.smpl import synthetic_smpl
from hugs_tpu.render import make_camera
from tests.test_data import write_fake_neuman

pytestmark = pytest.mark.slow  # 8-device shard_map compiles dominate suite time


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("neuman"))
    write_fake_neuman(root, n_frames=8, w=48, h=32)
    cfg = default_config()
    cfg.mode = "human_scene"
    cfg.train.num_steps = 4
    cfg.train.batch_size = 2
    cfg.train.save_ckpt_interval = 10_000
    cfg.train.val_interval = 10_000
    cfg.human.triplane_res = 16
    cfg.human.n_subdivision = 0
    cfg.human.use_deformer = True
    cfg.human.disable_posedirs = True
    cfg.human.loss.lpips_w = 0.0
    cfg.human.loss.patch_size = 16
    cfg.human.densify_from_iter = 1
    cfg.human.densification_interval = 3
    cfg.scene.densify_from_iter = 1
    cfg.scene.densification_interval = 3
    cfg.tpu.scene_capacity = 256
    cfg.tpu.human_capacity = 512
    cfg.tpu.tile_cap = 256
    cfg.tpu.instance_budget = 16384
    cfg.logdir = ""
    cfg.logdir_ckpt = ""
    from hugs_tpu.train.trainer import GaussianTrainer
    train_ds = NeumanDataset(root, "lab", "train", render_mode=cfg.mode)
    smpl = synthetic_smpl(verts_per_bone=8)
    trainer = GaussianTrainer(cfg, train_ds, None, None, smpl_model=smpl)
    return trainer


def make_anim_frames(n, w=48, h=32):
    """Synthetic anim split: orbiting cameras + varying poses + a manual
    alignment, the fields the NeuMan anim split produces."""
    rng = np.random.RandomState(7)
    frames = []
    for i in range(n):
        ang = 0.15 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        frames.append({
            "camera": make_camera(jnp.asarray(R),
                                  jnp.array([0.0, 0.2, 2.5]), 0.9, 0.7),
            "width": w, "height": h,
            "global_orient": rng.randn(3).astype(np.float32) * 0.1,
            "body_pose": rng.randn(69).astype(np.float32) * 0.1,
            "betas": np.zeros(10, np.float32),
            "transl": np.array([0.0, 0.0, 0.5], np.float32),
            "smpl_scale": np.float32(1.0),
            "manual_trans": np.array([0.05, 0.0, 0.1], np.float32),
            "manual_rotmat": np.eye(3, dtype=np.float32),
            "manual_scale": np.float32(1.1),
        })
    return frames


def test_animate_batched_parity(env):
    trainer = env
    trainer.anim_dataset = make_anim_frames(5)
    ref = trainer.animate(batch_size=1)
    batched = trainer.animate(batch_size=4)  # pads 5 -> 8
    assert len(ref) == len(batched) == 5
    for a, b in zip(ref, batched):
        np.testing.assert_allclose(a, b, atol=2e-5)
    trainer.anim_dataset = None


def test_animate_batched_sharded_parity(env):
    trainer = env
    trainer.anim_dataset = make_anim_frames(8)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    ref = trainer.animate(batch_size=1)
    sharded = trainer.animate(batch_size=8, mesh=mesh)
    assert len(sharded) == 8
    for a, b in zip(ref, sharded):
        np.testing.assert_allclose(a, b, atol=2e-5)
    trainer.anim_dataset = None


def test_trainer_batched_training(env):
    trainer = env
    log = trainer.train()
    losses = [e["loss"] for e in log]
    assert len(losses) >= 1 and np.isfinite(losses).all()
    # the dp step ran over >1 device when the batch divides the count
    assert trainer._dp_cache_key is not None


def test_batched_training_rejects_non_joint(env):
    cfg = default_config()
    cfg.mode = "human"
    cfg.train.batch_size = 2
    from hugs_tpu.train.trainer import GaussianTrainer
    t = GaussianTrainer.__new__(GaussianTrainer)
    t.cfg = cfg
    t.human = None
    t.scene = None
    with pytest.raises(ValueError):
        t._train_batched()


def test_batched_training_staged_scene_start(env):
    """opt_start_iter > 0 batched: before the boundary the scene is
    neither rendered nor optimized (reference gs_trainer.py:248-252 /
    349-351); after it, scene params move (VERDICT r4 item 7c)."""
    trainer = env
    cfg = trainer.cfg
    old_steps, old_start = cfg.train.num_steps, cfg.scene.opt_start_iter
    cfg.train.num_steps = 3
    cfg.scene.opt_start_iter = 2
    s_xyz0 = np.asarray(trainer.scene.gs.xyz).copy()
    trainer._dp_cache_key = None     # drop any cached joint-phase step
    try:
        # run the human phase only (iters 0..1): scene must be frozen
        cfg.train.num_steps = 1
        log = trainer.train()
        assert np.isfinite([e["loss"] for e in log]).all()
        np.testing.assert_array_equal(np.asarray(trainer.scene.gs.xyz),
                                      s_xyz0)
        # continue across the boundary: scene starts moving
        cfg.train.num_steps = 3
        trainer.train()
        assert np.abs(np.asarray(trainer.scene.gs.xyz) - s_xyz0).max() > 0
    finally:
        cfg.train.num_steps = old_steps
        cfg.scene.opt_start_iter = old_start
        trainer._dp_cache_key = None
