"""Scene Gaussian model (vanilla 3DGS) as a fixed-capacity pytree.

Behavioral equivalent of the reference SceneGS (hugs/models/scene.py:33),
redesigned for XLA's static-shape world: instead of growing/shrinking
tensors on densify/prune (which would retrigger compilation every
interval), all per-Gaussian arrays have a fixed CAPACITY and an `alive`
mask. Densify writes into free (dead) slots with masked scatters;
prune just clears mask bits. The reference's max_n_gaussians caps
(config.py:118,150) make this a semantics-preserving re-encoding.

Parameter storage conventions match the reference:
  scaling   : log-scale        (activation exp,     scene.py:42)
  opacity   : logit            (activation sigmoid, scene.py:47)
  rotation  : unnormalized quat (activation normalize, scene.py:50)
  features  : SH coeffs (N, K, 3), dc = coeff 0, rest = coeffs 1..K-1
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.ops.knn import mean_sq_dist_to_knn
from hugs_tpu.ops.sh import rgb_to_sh
from hugs_tpu.ops.covariance import build_rotation


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class SceneGS(NamedTuple):
    """All leading dims = capacity. Optimizable params + densification state."""
    # --- optimizable (touched by the per-group optimizer) ---
    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    scaling: jnp.ndarray        # (C, 3) log
    rotation: jnp.ndarray       # (C, 4)
    opacity: jnp.ndarray        # (C, 1) logit
    # --- non-optimizable state ---
    alive: jnp.ndarray             # (C,) bool
    max_radii2d: jnp.ndarray       # (C,)
    xyz_gradient_accum: jnp.ndarray  # (C,)
    denom: jnp.ndarray             # (C,)
    active_sh_degree: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "scaling",
                "rotation", "opacity")
# Per-group LR names as in the reference optimizer (scene.py:201-208)
PARAM_GROUP = {"xyz": "xyz", "features_dc": "f_dc", "features_rest": "f_rest",
               "scaling": "scaling", "rotation": "rotation",
               "opacity": "opacity"}


def params_of(gs: SceneGS) -> dict:
    return {f: getattr(gs, f) for f in PARAM_FIELDS}


def with_params(gs: SceneGS, params: dict) -> SceneGS:
    return gs._replace(**params)


def create_from_pcd(points: jnp.ndarray, colors: jnp.ndarray, capacity: int,
                    max_sh_degree: int = 3,
                    only_rgb: bool = False) -> SceneGS:
    """Initialize from a point cloud (reference create_from_pcd,
    scene.py:166-194): DC SH from RGB, log-scale from kNN density,
    identity rotations, opacity 0.1. only_rgb stores raw colors in the
    DC slot instead of RGB2SH (scene.py:170-173)."""
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"pcd has {n} points > capacity {capacity}")
    K = (max_sh_degree + 1) ** 2

    dist2 = jnp.maximum(mean_sq_dist_to_knn(points, k=3), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        widths = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    rots = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    return SceneGS(
        xyz=pad(jnp.asarray(points, jnp.float32)),
        features_dc=pad(
            (jnp.asarray(colors, jnp.float32) if only_rgb
             else rgb_to_sh(jnp.asarray(colors, jnp.float32)))[:, None, :]),
        features_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        scaling=pad(scales, fill=-10.0),
        rotation=pad(rots).at[n:, 0].set(1.0),
        opacity=pad(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity),
        xyz_gradient_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        active_sh_degree=jnp.int32(0),
    )


def create_from_ply(path: str, capacity: int | None = None,
                    max_sh_degree: int = 3) -> SceneGS:
    """Load a trained 3DGS-format PLY into a SceneGS (reference
    load_ply, scene.py:267-308 — the 3DGS-ecosystem import path used to
    eval pretrained scenes). The PLY stores RAW parameters (log scales,
    logit opacities, unnormalized quats), so rows drop straight into
    the param slots; SH degree starts at max (the file carries trained
    rest coefficients). capacity defaults to the next pow2 >= N."""
    import numpy as np
    from hugs_tpu.utils.ply import load_gaussian_ply
    raw = load_gaussian_ply(path, max_sh_degree=max_sh_degree)
    n = raw["xyz"].shape[0]
    cap = int(capacity) if capacity else max(
        128, 1 << int(np.ceil(np.log2(max(n, 1)))))
    if n > cap:
        raise ValueError(f"PLY has {n} gaussians > capacity {cap}")

    def pad(x, fill=0.0):
        widths = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(jnp.asarray(x, jnp.float32), widths,
                       constant_values=fill)

    return SceneGS(
        xyz=pad(raw["xyz"]),
        features_dc=pad(raw["features_dc"]),
        features_rest=pad(raw["features_rest"]),
        scaling=pad(raw["scaling"], fill=-10.0),
        rotation=pad(raw["rotation"]).at[n:, 0].set(1.0),
        opacity=pad(raw["opacity"], fill=-10.0),
        alive=jnp.arange(cap) < n,
        max_radii2d=jnp.zeros(cap),
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        active_sh_degree=jnp.int32(max_sh_degree),
    )


def scene_forward(gs: SceneGS, only_rgb: bool = False) -> dict:
    """Activate parameters into the flat attribute dict the renderer takes
    (reference forward, scene.py:147-160) + the alive capacity mask.

    only_rgb=True treats features_dc as a raw RGB color (reference
    get_features, scene.py:130-137): 'shs' becomes (N, 3) which
    project_gaussians consumes as a precomputed color, bypassing SH."""
    rot = gs.rotation / jnp.clip(
        jnp.linalg.norm(gs.rotation, axis=-1, keepdims=True), 1e-8)
    shs = (gs.features_dc[:, 0, :] if only_rgb
           else jnp.concatenate([gs.features_dc, gs.features_rest], axis=1))
    return {
        "xyz": gs.xyz,
        "scales": jnp.exp(gs.scaling),
        "rotq": rot,
        "shs": shs,
        "opacity": jax.nn.sigmoid(gs.opacity[:, 0]),
        "active_sh_degree": gs.active_sh_degree,
        "alive": gs.alive,
    }


def compact(gs: SceneGS, bucket: int | None = None) -> SceneGS:
    """Serving-time capacity right-sizing: gather alive rows into a
    pow2 bucket sized to the live population.

    Training keeps the full static capacity so densification never
    recompiles, but inference pays that padding on every frame —
    projection, LBS and the binning sort all run over capacity rows
    (e.g. the flagship checkpoint: 42k alive in 262k padded rows, a 6x
    row tax measured on chip). Host-side, outside jit: call once after
    loading a checkpoint. Dead tail rows duplicate row 0 with
    alive=False (projection culls them)."""
    import numpy as np
    alive = np.asarray(gs.alive)
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

    def take(name, x):
        if name == "active_sh_degree":
            return x
        if name == "alive":
            return new_alive
        return jnp.asarray(x)[gather]

    return SceneGS(**{f: take(f, getattr(gs, f)) for f in gs._fields})


def one_up_sh_degree(gs: SceneGS, max_sh_degree: int = 3) -> SceneGS:
    return gs._replace(active_sh_degree=jnp.minimum(
        gs.active_sh_degree + 1, max_sh_degree))


def add_densification_stats(gs: SceneGS, mean2d_grad: jnp.ndarray,
                            radii: jnp.ndarray,
                            visibility: jnp.ndarray) -> SceneGS:
    """Accumulate screen-space gradient norms + max radii for visible
    Gaussians (reference add_densification_stats scene.py:460-462 and the
    max_radii2D update gs_trainer.py:407-410)."""
    gnorm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    vis = visibility & gs.alive
    return gs._replace(
        xyz_gradient_accum=gs.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=gs.denom + vis.astype(gs.denom.dtype),
        max_radii2d=jnp.where(vis, jnp.maximum(gs.max_radii2d, radii),
                              gs.max_radii2d),
    )


def _scatter_rows(dst: jnp.ndarray, idx: jnp.ndarray, src: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """dst[idx[i]] = src[i] where valid[i]; invalid writes go to a dump row
    (index = capacity, dropped by scatter's out-of-bounds drop mode)."""
    cap = dst.shape[0]
    safe_idx = jnp.where(valid, idx, cap)  # OOB => dropped
    return dst.at[safe_idx].set(src, mode="drop")


def densify_and_prune(
    gs: SceneGS,
    opt_moments: list[dict],
    key: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    split_n: int = 2,
    max_n_gaussians: int | None = None,
) -> tuple[SceneGS, list[dict], dict]:
    """The full densify/clone/split/prune step as one pure function.

    Reference semantics (scene.py:401-458) re-encoded for fixed capacity:
      clone: grad>=thresh & max_scale <= percent_dense*extent -> copy
      split: grad>=thresh & max_scale  > percent_dense*extent -> 2 samples
             from the Gaussian, scale/(0.8*2); original pruned
      prune: opacity<min_op | radii2d>max_screen | scale>0.1*extent
    New points go into dead slots (slot exhaustion drops candidates, which
    matches the reference's max_n_gaussians cap behavior). `opt_moments`
    is a list of pytrees shaped like params (adam mu/nu); new slots are
    zeroed there, mirroring the reference's optimizer-state surgery
    (scene.py:359-379).

    Returns (new_gs, new_moments, info dict).
    """
    cap = gs.capacity
    grads = jnp.where(gs.denom > 0, gs.xyz_gradient_accum / gs.denom, 0.0)
    scales = jnp.exp(gs.scaling)
    max_scale = jnp.max(scales, axis=-1)

    hot = (grads >= grad_threshold) & gs.alive
    if max_n_gaussians is not None:
        # population guard (reference densify_and_prune, scene.py:445-449:
        # skip clone/split once past max_n_gs; pruning still applies)
        hot = hot & (jnp.sum(gs.alive) <= max_n_gaussians)
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)

    # ---- prune (before allocating, so freed slots are reusable) ----
    opac = jax.nn.sigmoid(gs.opacity[:, 0])
    prune = opac < min_opacity
    if max_screen_size is not None:
        prune = prune | (gs.max_radii2d > max_screen_size) \
            | (max_scale > 0.1 * extent)
    prune = (prune | split_sel) & gs.alive      # split originals also die
    alive = gs.alive & ~prune

    # ---- build candidate list: clones then split samples ----
    params = params_of(gs)

    # clone candidates: same attributes
    clone_cand = {f: params[f] for f in PARAM_FIELDS}
    clone_valid = clone_sel

    # split candidates: split_n per original, sampled xyz, shrunk scale
    noise = jax.random.normal(key, (split_n, cap, 3))
    R = build_rotation(gs.rotation)                       # (C, 3, 3)
    samples = jnp.einsum("cij,scj->sci", R, noise * scales[None])
    split_xyz = gs.xyz[None] + samples                    # (S, C, 3)
    split_scaling = jnp.log(scales / (0.8 * split_n))     # (C, 3)

    def cat_candidates(field):
        base = clone_cand[field]
        if field == "xyz":
            rep = split_xyz.reshape(split_n * cap, 3)
        elif field == "scaling":
            rep = jnp.tile(split_scaling, (split_n, 1))
        else:
            rep = jnp.tile(params[field],
                           (split_n,) + (1,) * (params[field].ndim - 1))
        return jnp.concatenate([base, rep], axis=0)

    cand = {f: cat_candidates(f) for f in PARAM_FIELDS}
    cand_valid = jnp.concatenate(
        [clone_valid, jnp.tile(split_sel, (split_n,))], axis=0)

    # ---- allocate free slots ----
    # rank of each valid candidate (0-based among valids)
    cand_rank = jnp.cumsum(cand_valid) - 1
    # free slots in index order: stable argsort puts alive=False first
    free_slots = jnp.argsort(alive, stable=True)
    n_free = cap - jnp.sum(alive)
    can_place = cand_valid & (cand_rank < n_free)
    dest = free_slots[jnp.clip(cand_rank, 0, cap - 1)]

    new_params = {
        f: _scatter_rows(params[f], dest, cand[f], can_place)
        for f in PARAM_FIELDS
    }
    new_alive = _scatter_rows(alive, dest,
                              jnp.ones_like(cand_valid), can_place)

    # ---- optimizer moment surgery: zero moments at newly used slots ----
    newly_used = jnp.zeros(cap, bool).at[
        jnp.where(can_place, dest, cap)].set(True, mode="drop")

    def zero_rows(moment, pname):
        del pname
        return jnp.where(
            newly_used.reshape((cap,) + (1,) * (moment.ndim - 1)),
            0.0, moment)

    new_moments = [
        {f: zero_rows(m[f], f) for f in PARAM_FIELDS} for m in opt_moments
    ]

    new_gs = with_params(gs, new_params)._replace(
        alive=new_alive,
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )
    info = {
        "n_cloned": jnp.sum(clone_valid),
        "n_split": jnp.sum(split_sel),
        "n_pruned": jnp.sum(prune & ~split_sel),
        "n_dropped": jnp.sum(cand_valid & ~can_place),
        "n_alive": jnp.sum(new_alive),
    }
    return new_gs, new_moments, info


def reset_opacity(gs: SceneGS, opt_moments: list[dict],
                  value: float = 0.01) -> tuple[SceneGS, list[dict]]:
    """Clamp opacity to <= value and zero its adam moments (reference
    reset_opacity scene.py:262-265 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(gs.opacity),
                                         value))
    new_moments = [
        {**m, "opacity": jnp.zeros_like(m["opacity"])} for m in opt_moments
    ]
    return gs._replace(opacity=new_op), new_moments
