"""Per-Gaussian-parameter human avatar (the no-triplane ablation).

Equivalent of the reference HUGS_WO_TRIMLP (hugs/models/hugs_wo_trimlp.py:
122-785, cfg_files/ablation/neuman/abl_trimlp.yaml): the human is a plain
3DGS parameter set (xyz / SH features / log-scales / quaternions / opacity
logits) living on the vitruvian canonical body, posed per frame by
kNN-transferred SMPL vertex transforms — no triplane, no decoders, no
learned skinning.

Reuse by construction: the per-Gaussian parameter block IS a SceneGS
pytree (same fields, same activations, same storage spaces), so scene
densification (scene_gs.densify_and_prune) and the scene optimizer groups
apply verbatim; only the posing forward differs.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hugs_tpu.models import scene_gs as sgs
from hugs_tpu.models.human_gs import (
    HumanGSFixed, compute_vitruvian, smpl_lbsmap_top_k, resolve_pose,
)
from hugs_tpu.models.smpl import SMPLModel, smpl_forward, vitruvian_pose
from hugs_tpu.models.mesh import unique_edges, vertex_normals
from hugs_tpu.models.scene_gs import inverse_sigmoid
from hugs_tpu.ops.rotations import (
    matrix_to_quat, rotation_matrix_from_vectors, quat_to_matrix,
    quat_multiply, axis_angle_to_rotation_6d,
)

SCALE_Z = 1e-5


class HumanPerGS(NamedTuple):
    gs: sgs.SceneGS             # canonical Gaussians + densify stats
    global_orient: jnp.ndarray  # (F, 6)
    body_pose: jnp.ndarray      # (F, 23*6)
    transl: jnp.ndarray         # (F, 3)
    betas: jnp.ndarray          # (10,)


def init_human_pergs(
    smpl: SMPLModel,
    smpl_template: SMPLModel,
    betas: jnp.ndarray,
    n_frames: int,
    capacity: int | None = None,
    init_scale_multiplier: float = 1.0,
    use_surface: bool = False,
    init_2d: bool = False,
    max_sh_degree: int = 3,
    init_body_pose=None, init_global_orient=None, init_transl=None,
) -> tuple[HumanPerGS, HumanGSFixed]:
    """Gaussians at subdivided-template vitruvian vertices (reference
    initialize(), hugs_wo_trimlp.py:432-491): log-scales from max incident
    edge length, rotations aligned to vertex normals, opacity 0.1,
    grey DC."""
    fixed = compute_vitruvian(smpl, betas)
    t_out = smpl_forward(smpl_template, betas, vitruvian_pose(),
                         jnp.zeros(3))
    t_verts = np.asarray(t_out.vertices)
    n = t_verts.shape[0]
    capacity = capacity or n
    K = (max_sh_degree + 1) ** 2

    edges = unique_edges(smpl_template.faces)
    elen = np.linalg.norm(t_verts[edges[:, 0]] - t_verts[edges[:, 1]],
                          axis=-1) * init_scale_multiplier
    max_len = np.zeros(n, np.float32)
    np.maximum.at(max_len, edges[:, 0], elen)
    np.maximum.at(max_len, edges[:, 1], elen)
    scales = np.log(np.repeat(max_len[:, None], 3, axis=1))
    if use_surface or init_2d:
        scales[:, 2] = np.log(SCALE_Z)

    normals = vertex_normals(t_verts, smpl_template.faces)
    z = np.zeros_like(normals)
    z[:, 2] = 1.0
    rotq = matrix_to_quat(rotation_matrix_from_vectors(
        jnp.asarray(z), jnp.asarray(normals)))

    def pad(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        widths = [(0, capacity - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    gs = sgs.SceneGS(
        xyz=pad(t_verts),
        features_dc=pad(0.5 * jnp.ones((n, 1, 3))),
        features_rest=jnp.zeros((capacity, K - 1, 3)),
        scaling=pad(scales, fill=-10.0),
        rotation=pad(rotq).at[n:, 0].set(1.0),
        opacity=pad(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity),
        xyz_gradient_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        active_sh_degree=jnp.int32(0),
    )

    def pose6d(aa, per, width):
        if aa is None:
            ident = jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), per)
            return jnp.tile(ident[None], (n_frames, 1))
        return axis_angle_to_rotation_6d(
            jnp.asarray(aa).reshape(-1, 3)).reshape(n_frames, width)

    params = HumanPerGS(
        gs=gs,
        global_orient=pose6d(init_global_orient, 1, 6),
        body_pose=pose6d(init_body_pose, 23, 23 * 6),
        transl=(jnp.asarray(init_transl) if init_transl is not None
                else jnp.zeros((n_frames, 3))),
        betas=jnp.asarray(betas),
    )
    return params, fixed


def compact_for_inference(params: HumanPerGS,
                          bucket: int | None = None) -> HumanPerGS:
    """Serving-time capacity right-sizing (see scene_gs.compact): the
    per-Gaussian block IS a SceneGS, and human_pergs_forward derives
    everything row-wise from it, so compacting it compacts the model."""
    return params._replace(gs=sgs.compact(params.gs, bucket))


def human_pergs_forward(
    params: HumanPerGS,
    fixed: HumanGSFixed,
    global_orient=None, body_pose=None, betas=None, transl=None,
    smpl_scale=None, dataset_idx: int | jnp.ndarray = 0, ext_tfs=None,
    isotropic: bool = False,
) -> dict[str, Any]:
    """Activate + pose (reference forward, hugs_wo_trimlp.py:290-396)."""
    out = sgs.scene_forward(params.gs)
    gs_xyz = out["xyz"]
    gs_scales = out["scales"]
    gs_rotq = out["rotq"]
    if isotropic:
        gs_scales = jnp.ones_like(gs_scales) * jnp.mean(
            gs_scales, axis=-1, keepdims=True)
    gs_scales_canon = gs_scales
    gs_rotmat = quat_to_matrix(gs_rotq)

    global_orient, body_pose, betas, transl = resolve_pose(
        params, dataset_idx, global_orient, body_pose, betas, transl)
    s_out = smpl_forward(fixed.smpl, betas, body_pose, global_orient)

    curr_offsets = s_out.shape_offsets + s_out.pose_offsets
    T_v2t = fixed.inv_T_t2vitruvian
    T_v2t = T_v2t.at[..., :3, 3].add(fixed.canonical_offsets - curr_offsets)
    T_vitruvian2pose = s_out.T @ T_v2t
    _, lbs_T = smpl_lbsmap_top_k(
        fixed.smpl.lbs_weights, T_vitruvian2pose, gs_xyz,
        fixed.vitruvian_verts, K=6)
    hom = jnp.concatenate([gs_xyz, jnp.ones_like(gs_xyz[:, :1])], -1)
    deformed_xyz = jnp.einsum("nab,nb->na", lbs_T, hom)[:, :3]

    if smpl_scale is not None:
        deformed_xyz = deformed_xyz * smpl_scale
        gs_scales = gs_scales * smpl_scale
    if transl is not None:
        deformed_xyz = deformed_xyz + transl[None]

    deformed_rotmat = lbs_T[:, :3, :3] @ gs_rotmat
    deformed_rotq = matrix_to_quat(deformed_rotmat)

    if ext_tfs is not None:
        tr, rotmat, sc = ext_tfs
        deformed_xyz = tr[None] + sc * jnp.einsum("ab,nb->na", rotmat,
                                                  deformed_xyz)
        gs_scales = sc * gs_scales
        deformed_rotq = quat_multiply(matrix_to_quat(rotmat)[None],
                                      deformed_rotq)
        deformed_rotmat = jnp.einsum("ab,nbc->nac", rotmat, deformed_rotmat)

    normals = jnp.zeros_like(gs_xyz).at[:, 2].set(1.0)
    return {
        "xyz": deformed_xyz,
        "xyz_canon": gs_xyz,
        "xyz_offsets": jnp.zeros_like(gs_xyz),
        "scales": gs_scales,
        "scales_canon": gs_scales_canon,
        "rotq": deformed_rotq,
        "rotq_canon": gs_rotq,
        "rotmat": deformed_rotmat,
        "rotmat_canon": gs_rotmat,
        "shs": out["shs"],
        "opacity": out["opacity"],
        "normals": jnp.einsum("nab,nb->na", deformed_rotmat, normals),
        "normals_canon": jnp.einsum("nab,nb->na", gs_rotmat, normals),
        "active_sh_degree": params.gs.active_sh_degree,
        "lbs_weights": None,
        "posedirs": None,
        "gt_lbs_weights": None,
        "alive": params.gs.alive,
    }
