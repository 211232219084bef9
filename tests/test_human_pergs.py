import jax
import jax.numpy as jnp
import numpy as np

from hugs_tpu.models.smpl import synthetic_smpl
from hugs_tpu.models.human_gs_pergs import (
    init_human_pergs, human_pergs_forward,
)
from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.render import render, make_camera
from hugs_tpu.train.scene_step import scene_densify_step, \
    init_scene_train_state


def test_pergs_init_and_forward():
    smpl = synthetic_smpl(verts_per_bone=12)
    params, fixed = init_human_pergs(smpl, smpl, jnp.zeros(10), n_frames=3,
                                     capacity=512)
    assert int(params.gs.n_alive) == smpl.n_verts
    out = human_pergs_forward(params, fixed, dataset_idx=1,
                              smpl_scale=jnp.float32(1.0))
    for k in ("xyz", "scales", "rotq", "shs", "opacity"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # canonical == deformed under identity learned pose at the vitruvian?
    # no — learned pose defaults to identity (t-pose), so the body moves
    # from vitruvian to t-pose; just check it renders
    cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.2, 2.5]), 0.9, 0.9)
    img = render(out["xyz"], out["scales"], out["rotq"], out["opacity"],
                 out["shs"], cam, 48, 48, alive=out["alive"],
                 tile_cap=256, instance_budget=8192)["render"]
    assert float(img.mean()) > 1e-4


def test_pergs_pose_changes_image():
    smpl = synthetic_smpl(verts_per_bone=12)
    params, fixed = init_human_pergs(smpl, smpl, jnp.zeros(10), n_frames=1,
                                     capacity=smpl.n_verts)
    cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.2, 2.5]), 0.9, 0.9)

    def img_of(pose):
        out = human_pergs_forward(params, fixed, global_orient=jnp.zeros(3),
                                  body_pose=pose, betas=jnp.zeros(10),
                                  transl=jnp.zeros(3))
        return render(out["xyz"], out["scales"], out["rotq"],
                      out["opacity"], out["shs"], cam, 48, 48,
                      alive=out["alive"], tile_cap=256,
                      instance_budget=8192)["render"]

    i0 = img_of(jnp.zeros(69))
    i1 = img_of(jnp.zeros(69).at[2].set(0.9))
    assert float(jnp.abs(i1 - i0).mean()) > 1e-5


def test_pergs_densification_reuses_scene_machinery():
    smpl = synthetic_smpl(verts_per_bone=8)
    params, fixed = init_human_pergs(smpl, smpl, jnp.zeros(10), n_frames=1,
                                     capacity=512)
    state = init_scene_train_state(params.gs)
    hot = (jnp.arange(512) < 40) & params.gs.alive
    gs = state.gs._replace(xyz_gradient_accum=jnp.where(hot, 1.0, 0.0),
                           denom=jnp.ones(512))
    state = state._replace(gs=gs)
    state2, info = scene_densify_step(state, jax.random.PRNGKey(0), 2.0,
                                      grad_threshold=0.5, min_opacity=0.001)
    assert int(info["n_alive"]) > 0
    assert int(info["n_cloned"]) + int(info["n_split"]) > 0
