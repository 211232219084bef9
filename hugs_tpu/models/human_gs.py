"""HUGS human avatar model (Triplane + MLP decoders + LBS), functional JAX.

Equivalent of the reference HUGS_TRIMLP (hugs/models/hugs_trimlp.py:41-882),
restructured for jit: parameters, mutable state, and frozen precomputations
are separate pytrees, and every method is a pure function.

  HumanGS       optimizable params (canonical points, triplane, decoders,
                per-frame learned pose/transl in 6D, betas)
  HumanGSState  capacity mask + densification stats + SH ramp
  HumanGSFixed  SMPL body + vitruvian-canonicalization transforms
                (reference get_vitruvian_verts, hugs_trimlp.py:563-577)

Forward pipeline (reference forward, hugs_trimlp.py:396-556):
  triplane(xyz) -> appearance/geometry[/deformation] decode ->
  SMPL(betas, pose) joint transforms -> skin canonical Gaussians
  (predicted-weight lbs_extra path or kNN transform transfer path) ->
  smpl_scale/transl/ext_tfs -> flat attribute dict for the renderer.

NOTE on scales: human Gaussian scales are LINEAR (gelu output x
scaling_multiplier), not log-space — matching the reference.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


from hugs_tpu.models.smpl import SMPLModel, smpl_forward, lbs_extra, \
    vitruvian_pose

# positions flow through these transforms; TPU bf16-default matmul
# error (2^-8 relative) is ~millimetres -> pixels. Tiny-K: HIGHEST is free.
_HI = jax.lax.Precision.HIGHEST
from hugs_tpu.models.mesh import unique_edges, vertex_normals
from hugs_tpu.models.nets import (
    triplane_init, triplane_apply,
    appearance_decoder_init, appearance_decoder_apply,
    geometry_decoder_init, geometry_decoder_apply,
    deformation_decoder_init, deformation_decoder_apply,
)
from hugs_tpu.ops.knn import knn
from hugs_tpu.ops.rotations import (
    rotation_6d_to_matrix, matrix_to_quat, matrix_to_rotation_6d,
    axis_angle_to_rotation_6d, rotation_6d_to_axis_angle, quat_multiply,
    rotation_matrix_from_vectors,
)

SCALE_Z = 1e-5


class HumanGSConfig(NamedTuple):
    """Static architecture/behavior flags (reference ctor args,
    hugs_trimlp.py:60-75)."""
    sh_degree: int = 0
    n_features: int = 32
    triplane_res: int = 256
    use_deformer: bool = True
    disable_posedirs: bool = True
    use_surface: bool = False
    init_2d: bool = False
    rotate_sh: bool = False
    isotropic: bool = False
    init_scale_multiplier: float = 0.5


class HumanGS(NamedTuple):
    xyz: jnp.ndarray            # (C, 3) canonical (vitruvian) positions
    triplane: dict
    appearance_dec: dict
    geometry_dec: dict
    deformation_dec: dict
    global_orient: jnp.ndarray  # (F, 6) learned per-frame 6D
    body_pose: jnp.ndarray      # (F, 23*6)
    transl: jnp.ndarray         # (F, 3)
    betas: jnp.ndarray          # (10,)


class HumanGSState(NamedTuple):
    scaling_multiplier: jnp.ndarray  # (C, 1)
    alive: jnp.ndarray               # (C,)
    max_radii2d: jnp.ndarray
    xyz_gradient_accum: jnp.ndarray
    denom: jnp.ndarray
    active_sh_degree: jnp.ndarray    # () int32


class HumanGSFixed(NamedTuple):
    """Constants captured at model build (do NOT pass through jit args —
    close over them; parents/faces are static numpy)."""
    smpl: SMPLModel                 # the posing body (non-subdivided)
    vitruvian_verts: jnp.ndarray    # (Vs, 3) posed smpl verts in vitruvian
    inv_A_t2vitruvian: jnp.ndarray  # (J, 4, 4)
    inv_T_t2vitruvian: jnp.ndarray  # (Vs, 4, 4)
    canonical_offsets: jnp.ndarray  # (Vs, 3) shape+pose offsets at vitruvian


DENSIFY_PARAM_FIELDS = ("xyz",)
NET_FIELDS = ("triplane", "appearance_dec", "geometry_dec",
              "deformation_dec")


def compute_vitruvian(smpl: SMPLModel, betas: jnp.ndarray) -> HumanGSFixed:
    out = smpl_forward(smpl, betas, vitruvian_pose(), jnp.zeros(3))
    return HumanGSFixed(
        smpl=smpl,
        vitruvian_verts=jax.lax.stop_gradient(out.vertices),
        inv_A_t2vitruvian=jnp.linalg.inv(out.A),
        inv_T_t2vitruvian=jnp.linalg.inv(out.T),
        canonical_offsets=out.shape_offsets + out.pose_offsets,
    )


def init_human_gs(
    key: jax.Array,
    cfg: HumanGSConfig,
    smpl: SMPLModel,
    smpl_template: SMPLModel,
    betas: jnp.ndarray,
    n_frames: int,
    capacity: int | None = None,
    init_body_pose: jnp.ndarray | None = None,   # (F, 69) axis-angle
    init_global_orient: jnp.ndarray | None = None,  # (F, 3)
    init_transl: jnp.ndarray | None = None,      # (F, 3)
):
    """Build params/state/fixed + mesh-derived init targets for the
    distillation pre-fit (reference initialize(), hugs_trimlp.py:594-665).

    smpl_template may be a subdivided copy (Gaussian placement); smpl is
    the original body used for posing and kNN weight transfer.
    """
    fixed = compute_vitruvian(smpl, betas)

    # template vitruvian verts = initial canonical Gaussian positions
    t_out = smpl_forward(smpl_template, betas, vitruvian_pose(), jnp.zeros(3))
    t_verts = np.asarray(t_out.vertices)
    n = t_verts.shape[0]
    capacity = capacity or n
    assert capacity >= n

    # per-vertex max incident edge length -> init scale (linear space)
    edges = unique_edges(smpl_template.faces)
    elen = np.linalg.norm(t_verts[edges[:, 0]] - t_verts[edges[:, 1]],
                          axis=-1) * cfg.init_scale_multiplier
    max_len = np.zeros(n, np.float32)
    np.maximum.at(max_len, edges[:, 0], elen)
    np.maximum.at(max_len, edges[:, 1], elen)
    scales = np.repeat(max_len[:, None], 3, axis=1)
    if cfg.use_surface or cfg.init_2d:
        scales[:, 2] = SCALE_Z

    # rotations aligning gaussian +z to mesh vertex normals
    normals = vertex_normals(t_verts, smpl_template.faces)
    z = np.zeros_like(normals)
    z[:, 2] = 1.0
    rotmat = rotation_matrix_from_vectors(jnp.asarray(z), jnp.asarray(normals))
    rot6d = matrix_to_rotation_6d(rotmat)

    def pad(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        widths = [(0, capacity - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    shs = jnp.zeros((n, 16, 3)).at[:, 0, :].set(0.5)
    init_values = {
        "xyz_offsets": jnp.zeros((capacity, 3)),
        "scales": pad(scales),
        "rot6d_canon": pad(rot6d),
        "shs": pad(shs),
        "opacity": pad(0.1 * jnp.ones((n, 1))),
        "lbs_weights": pad(smpl_template.lbs_weights),
        "posedirs": smpl_template.posedirs,
        "edges": edges,
    }

    ks = jax.random.split(key, 4)
    nf3 = cfg.n_features * 3
    params = HumanGS(
        xyz=pad(t_verts),
        triplane=triplane_init(ks[0], cfg.n_features, cfg.triplane_res),
        appearance_dec=appearance_decoder_init(ks[1], nf3),
        geometry_dec=geometry_decoder_init(ks[2], nf3,
                                           use_surface=cfg.use_surface),
        deformation_dec=deformation_decoder_init(
            ks[3], nf3, disable_posedirs=cfg.disable_posedirs),
        global_orient=(axis_angle_to_rotation_6d(
            init_global_orient.reshape(-1, 3)).reshape(n_frames, 6)
            if init_global_orient is not None
            else jnp.tile(jnp.array([[1.0, 0, 0, 0, 1, 0]]), (n_frames, 1))),
        body_pose=(axis_angle_to_rotation_6d(
            init_body_pose.reshape(-1, 3)).reshape(n_frames, 23 * 6)
            if init_body_pose is not None
            else jnp.tile(jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), 23)[None],
                          (n_frames, 1))),
        transl=(jnp.asarray(init_transl) if init_transl is not None
                else jnp.zeros((n_frames, 3))),
        betas=jnp.asarray(betas),
    )
    state = HumanGSState(
        scaling_multiplier=jnp.ones((capacity, 1)),
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity),
        xyz_gradient_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        active_sh_degree=jnp.int32(0),
    )
    return params, state, fixed, init_values


# ------------------------------------------------------- kNN LBS transfer

def _knn_confidence_weights(lbs_weights, dists, idxs, weight_std: float = 0.1):
    """Shared confidence-gated distance weighting (reference
    smpl_lbsweight_top_k / smpl_lbsmap_top_k, hugs_wo_trimlp.py:47-119)."""
    w_nb = lbs_weights[idxs]                          # (N, K, J)
    conf = jnp.exp(-jnp.sum(jnp.abs(w_nb - w_nb[:, 0:1, :]), axis=-1)
                   / (2.0 * weight_std ** 2))
    conf = (conf > 0.9).astype(dists.dtype)
    w = jnp.exp(-dists) * conf
    w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return w, w_nb


def smpl_lbsweight_top_k(lbs_weights, points, template_points, K: int = 6):
    """kNN-transferred skinning weights (N, J)."""
    dists, idxs = knn(points, template_points, K)
    w, w_nb = _knn_confidence_weights(lbs_weights, dists, idxs)
    out = jnp.sum(w[..., None] * w_nb, axis=1)
    dist = jnp.sum(w * dists, axis=-1, keepdims=True)
    return dist, out


def smpl_lbsmap_top_k(lbs_weights, verts_transform, points, template_points,
                      K: int = 6):
    """kNN-transferred per-point 4x4 transforms."""
    dists, idxs = knn(points, template_points, K)
    w, _ = _knn_confidence_weights(lbs_weights, dists, idxs)
    tf_nb = verts_transform[idxs]                      # (N, K, 4, 4)
    tf = jnp.sum(w[..., None, None] * tf_nb, axis=1)
    dist = jnp.sum(w * dists, axis=-1, keepdims=True)
    return dist, tf


# ------------------------------------------------------------ forward

def canon_forward(params: HumanGS, state: HumanGSState,
                  cfg: HumanGSConfig) -> dict:
    """Triplane decode of the canonical Gaussian attributes (reference
    canon_forward, hugs_trimlp.py:205-238)."""
    feats = triplane_apply(params.triplane, params.xyz)
    app = appearance_decoder_apply(params.appearance_dec, feats)
    geo = geometry_decoder_apply(params.geometry_dec, feats)

    out = {
        "xyz_offsets": geo["xyz"],
        "scales": geo["scales"] * state.scaling_multiplier,
        "rot6d_canon": geo["rotations"],
        "shs": app["shs"].reshape(-1, 16, 3),
        "opacity": app["opacity"],
        "lbs_weights": None,
        "posedirs": None,
    }
    if cfg.use_deformer:
        dfm = deformation_decoder_apply(params.deformation_dec, feats)
        out["lbs_weights"] = jax.nn.softmax(dfm["lbs_weights"] / 0.1, axis=-1)
        out["posedirs"] = dfm["posedirs"]
    return out


def compact_for_inference(
    params: HumanGS, state: HumanGSState, canon_out: dict,
    bucket: int | None = None,
) -> tuple[HumanGS, HumanGSState, dict]:
    """Serving-time capacity right-sizing (counterpart of
    scene_gs.compact): gather alive rows of the per-Gaussian arrays —
    params.xyz, the state masks/stats, and the cached canonical decode —
    into a pow2 bucket sized to the live population, so the per-frame
    skinning + render path stops paying the training capacity's row tax.
    Host-side, outside jit; run canon_forward FIRST, then compact its
    output (the triplane decode itself is per-row too, so decoding at
    full capacity once is fine). Network params and per-frame pose
    tables are untouched."""
    import numpy as np
    alive = np.asarray(state.alive)
    idx = np.flatnonzero(alive)
    n = max(int(idx.size), 1)
    cap = int(bucket) if bucket else max(
        128, 1 << int(np.ceil(np.log2(n))))
    if cap < n:
        raise ValueError(f"bucket {cap} < {n} alive gaussians")
    full = np.zeros(cap, np.int64)
    full[:idx.size] = idx
    gather = jnp.asarray(full)
    new_alive = jnp.asarray(np.arange(cap) < idx.size)

    def rows(x):
        return jnp.asarray(x)[gather]

    params = params._replace(xyz=rows(params.xyz))
    state = state._replace(
        scaling_multiplier=rows(state.scaling_multiplier),
        alive=new_alive,
        max_radii2d=rows(state.max_radii2d),
        xyz_gradient_accum=rows(state.xyz_gradient_accum),
        denom=rows(state.denom))
    def canon_field(k, v):
        if v is None:
            return None
        if k == "posedirs":   # (207, 3N) reference layout, not row-major
            pd = jnp.asarray(v).reshape(207, -1, 3)
            return pd[:, gather, :].reshape(207, -1)
        return rows(v)

    canon_out = {k: canon_field(k, v) for k, v in canon_out.items()}
    return params, state, canon_out


def resolve_pose(params: HumanGS, dataset_idx, global_orient=None,
                 body_pose=None, betas=None, transl=None):
    """Use caller-provided SMPL params, else the learned per-frame ones
    (reference hugs_trimlp.py:442-454)."""
    if global_orient is None:
        global_orient = rotation_6d_to_axis_angle(
            params.global_orient[dataset_idx].reshape(1, 6)).reshape(3)
    if body_pose is None:
        body_pose = rotation_6d_to_axis_angle(
            params.body_pose[dataset_idx].reshape(23, 6)).reshape(69)
    if betas is None:
        betas = params.betas
    if transl is None:
        transl = params.transl[dataset_idx]
    return global_orient, body_pose, betas, transl


def human_forward(
    params: HumanGS,
    state: HumanGSState,
    fixed: HumanGSFixed,
    cfg: HumanGSConfig,
    global_orient: jnp.ndarray | None = None,
    body_pose: jnp.ndarray | None = None,
    betas: jnp.ndarray | None = None,
    transl: jnp.ndarray | None = None,
    smpl_scale: jnp.ndarray | None = None,
    dataset_idx: jnp.ndarray | int = 0,
    ext_tfs: tuple | None = None,
    canon_out: dict | None = None,
    compute_gt_lbs: bool = True,
) -> dict[str, Any]:
    """Full posed forward -> renderer attribute dict. Pass `canon_out`
    (from canon_forward) to reuse cached canonical decode (the reference's
    forward_test fast path, hugs_trimlp.py:240-394).

    compute_gt_lbs: the kNN-transferred GT skinning weights exist only
    for the LBS training loss (reference computes them under no_grad in
    forward(), hugs_trimlp.py:477-489, and SKIPS them in forward_test).
    Eval/animation/inference callers pass False and save the kNN
    (~17 ms/frame at 131k capacity on chip)."""
    if canon_out is None:
        canon_out = canon_forward(params, state, cfg)

    gs_xyz = params.xyz + canon_out["xyz_offsets"]
    gs_scales = canon_out["scales"]
    gs_rotmat = rotation_6d_to_matrix(canon_out["rot6d_canon"])
    gs_rotq = matrix_to_quat(gs_rotmat)
    gs_opacity = canon_out["opacity"][:, 0]
    gs_shs = canon_out["shs"]

    if cfg.isotropic:
        gs_scales = jnp.ones_like(gs_scales) * jnp.mean(gs_scales, axis=-1,
                                                        keepdims=True)
    gs_scales_canon = gs_scales

    global_orient, body_pose, betas, transl = resolve_pose(
        params, dataset_idx, global_orient, body_pose, betas, transl)

    s_out = smpl_forward(fixed.smpl, betas, body_pose, global_orient)

    gt_lbs_weights = None
    if cfg.use_deformer:
        # vitruvian -> t-pose -> posed via per-joint transforms
        A_vitruvian2pose = jnp.matmul(s_out.A, fixed.inv_A_t2vitruvian,
                                      precision=_HI)
        deformed_xyz, lbs_T, _ = lbs_extra(
            A_vitruvian2pose, gs_xyz, canon_out["posedirs"],
            canon_out["lbs_weights"], s_out.full_pose,
            disable_posedirs=cfg.disable_posedirs)
        if compute_gt_lbs:
            _, gt_lbs_weights = smpl_lbsweight_top_k(
                fixed.smpl.lbs_weights, jax.lax.stop_gradient(gs_xyz),
                fixed.vitruvian_verts)
            gt_lbs_weights = jax.lax.stop_gradient(gt_lbs_weights)
    else:
        curr_offsets = s_out.shape_offsets + s_out.pose_offsets
        T_v2t = fixed.inv_T_t2vitruvian
        T_v2t = T_v2t.at[..., :3, 3].add(fixed.canonical_offsets - curr_offsets)
        T_vitruvian2pose = jnp.matmul(s_out.T, T_v2t, precision=_HI)
        _, lbs_T = smpl_lbsmap_top_k(
            fixed.smpl.lbs_weights, T_vitruvian2pose, gs_xyz,
            fixed.vitruvian_verts, K=6)
        hom = jnp.concatenate([gs_xyz, jnp.ones_like(gs_xyz[:, :1])], -1)
        deformed_xyz = jnp.einsum("nab,nb->na", lbs_T, hom,
                                  precision=_HI)[:, :3]

    if smpl_scale is not None:
        deformed_xyz = deformed_xyz * smpl_scale
        gs_scales = gs_scales * smpl_scale
    if transl is not None:
        deformed_xyz = deformed_xyz + transl[None]

    deformed_rotmat = jnp.matmul(lbs_T[:, :3, :3], gs_rotmat,
                                 precision=_HI)
    deformed_rotq = matrix_to_quat(deformed_rotmat)

    if ext_tfs is not None:
        tr, rotmat, sc = ext_tfs
        deformed_xyz = tr[None] + sc * jnp.einsum("ab,nb->na", rotmat,
                                                  deformed_xyz,
                                                  precision=_HI)
        gs_scales = sc * gs_scales
        rotq = matrix_to_quat(rotmat)
        deformed_rotq = quat_multiply(rotq[None], deformed_rotq)
        deformed_rotmat = jnp.einsum("ab,nbc->nac", rotmat,
                                     deformed_rotmat, precision=_HI)

    normals = jnp.zeros_like(gs_xyz).at[:, 2].set(1.0)
    return {
        "xyz": deformed_xyz,
        "xyz_canon": gs_xyz,
        "xyz_offsets": canon_out["xyz_offsets"],
        "scales": gs_scales,
        "scales_canon": gs_scales_canon,
        "rotq": deformed_rotq,
        "rotq_canon": gs_rotq,
        "rotmat": deformed_rotmat,
        "rotmat_canon": gs_rotmat,
        "shs": gs_shs,
        "opacity": gs_opacity,
        "normals": jnp.einsum("nab,nb->na", deformed_rotmat, normals),
        "normals_canon": jnp.einsum("nab,nb->na", gs_rotmat, normals),
        "active_sh_degree": state.active_sh_degree,
        "rot6d_canon": canon_out["rot6d_canon"],
        "lbs_weights": canon_out["lbs_weights"],
        "posedirs": canon_out["posedirs"],
        "gt_lbs_weights": gt_lbs_weights,
        "alive": state.alive,
    }


# ------------------------------------------------- densification (human)

def add_densification_stats(state: HumanGSState, mean2d_grad, radii,
                            visibility) -> HumanGSState:
    gnorm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    vis = visibility & state.alive
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=state.denom + vis.astype(state.denom.dtype),
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d, radii),
                              state.max_radii2d))


def one_up_sh_degree(state: HumanGSState, max_sh_degree: int) -> HumanGSState:
    return state._replace(active_sh_degree=jnp.minimum(
        state.active_sh_degree + 1, max_sh_degree))


def densify_and_prune(
    params: HumanGS,
    state: HumanGSState,
    xyz_moments: list,          # [mu.xyz, nu.xyz] — zeroed at reused slots
    human_gs_out: dict,
    key: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    split_n: int = 2,
    max_n_gaussians: int | None = None,
):
    """Human densify/clone/split/prune (reference hugs_trimlp.py:794-878),
    fixed-capacity masked form. Only canonical `xyz` and the per-point
    `scaling_multiplier` are densifiable; Gaussian attributes used in the
    split/prune criteria come decoded from the current forward
    (`opacity`, `scales_canon`, `rotmat_canon` — the reference's *_tmp).
    """
    cap = params.xyz.shape[0]
    grads = jnp.where(state.denom > 0,
                      state.xyz_gradient_accum / state.denom, 0.0)
    opac = human_gs_out["opacity"].reshape(-1)
    scales = human_gs_out["scales_canon"]
    rotmat = human_gs_out["rotmat_canon"]
    max_scale = jnp.max(scales, axis=-1)

    hot = (grads >= grad_threshold) & state.alive
    if max_n_gaussians is not None:
        hot = hot & (jnp.sum(state.alive) <= max_n_gaussians)
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)
    # elongated-gaussian filter (hugs_trimlp.py:820-823)
    med = jnp.median(scales, axis=-1, keepdims=True)
    elongated = jnp.any((scales - med) / jnp.clip(med, 1e-12) >= 1.0, axis=-1)
    split_sel = split_sel & elongated

    prune = (opac < min_opacity)
    if max_screen_size is not None:
        prune = prune | (state.max_radii2d > max_screen_size) \
            | (max_scale > 0.1 * extent)
    prune = (prune | split_sel) & state.alive
    alive = state.alive & ~prune

    # candidates: clones (same xyz/mult) + split samples
    noise = jax.random.normal(key, (split_n, cap, 3))
    samples = jnp.einsum("cij,scj->sci", rotmat,
                         noise * jax.nn.relu(scales)[None])
    split_xyz = (params.xyz[None] + samples).reshape(split_n * cap, 3)

    cand_xyz = jnp.concatenate([params.xyz, split_xyz], axis=0)
    cand_mult = jnp.concatenate(
        [state.scaling_multiplier,
         jnp.tile(state.scaling_multiplier / (0.8 * split_n), (split_n, 1))],
        axis=0)
    cand_valid = jnp.concatenate(
        [clone_sel, jnp.tile(split_sel, (split_n,))], axis=0)

    cand_rank = jnp.cumsum(cand_valid) - 1
    free_slots = jnp.argsort(alive, stable=True)
    n_free = cap - jnp.sum(alive)
    can_place = cand_valid & (cand_rank < n_free)
    dest = free_slots[jnp.clip(cand_rank, 0, cap - 1)]
    safe_dest = jnp.where(can_place, dest, cap)

    new_xyz = params.xyz.at[safe_dest].set(cand_xyz, mode="drop")
    new_mult = state.scaling_multiplier.at[safe_dest].set(cand_mult,
                                                          mode="drop")
    new_alive = alive.at[safe_dest].set(True, mode="drop")

    newly_used = jnp.zeros(cap, bool).at[safe_dest].set(True, mode="drop")
    new_moments = [jnp.where(newly_used[:, None], 0.0, m)
                   for m in xyz_moments]

    new_params = params._replace(xyz=new_xyz)
    new_state = state._replace(
        scaling_multiplier=new_mult, alive=new_alive,
        xyz_gradient_accum=jnp.zeros(cap), denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap))
    info = {"n_cloned": jnp.sum(clone_sel), "n_split": jnp.sum(split_sel),
            "n_pruned": jnp.sum(prune & ~split_sel),
            "n_alive": jnp.sum(new_alive)}
    return new_params, new_state, new_moments, info
