"""SMPL body model, pure JAX.

Functional re-implementation of the reference's SMPL layer + LBS math
(hugs/models/modules/smpl_layer.py:55-637, hugs/models/modules/lbs.py):
shape blendshapes -> joint regression -> pose blendshapes -> kinematic
chain -> linear blend skinning, with the extra outputs HUGS needs
(per-joint transforms A, per-vertex transforms T, shape/pose offsets,
full axis-angle pose).

Model data is a plain pytree (SMPLModel) loadable from:
  - the standard SMPL_NEUTRAL.pkl (chumpy arrays handled via a shim),
  - an .npz with the same field names,
  - or `synthetic_smpl()` — a deterministic articulated "capsule person"
    with the real SMPL kinematic tree, for tests and demos when the
    (license-gated) SMPL data files are absent.

All matmuls (blendshapes V x 3B, skinning V x J) are MXU-shaped einsums.
"""
from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from hugs_tpu.ops.rotations import axis_angle_to_matrix

# TPU matmuls default to bf16; skinning/joint transforms feed world
# positions where 2^-8 relative error is millimetres -> pixels. These
# contractions are tiny, so HIGHEST costs nothing.
_HI = jax.lax.Precision.HIGHEST

NUM_JOINTS = 24          # incl. root
NUM_BODY_JOINTS = 23
NUM_POSE_FEATURES = 207  # 23 * 9

# SMPL kinematic tree (standard, public): parent of each of the 24 joints.
SMPL_PARENTS = np.array([
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 20, 21])

# Approximate T-pose joint positions (meters) for the synthetic model.
_SYNTH_JOINTS = np.array([
    [0.00, 0.00, 0.00],    # 0 pelvis
    [0.07, -0.08, 0.00],   # 1 L hip
    [-0.07, -0.08, 0.00],  # 2 R hip
    [0.00, 0.10, 0.00],    # 3 spine1
    [0.10, -0.48, 0.00],   # 4 L knee
    [-0.10, -0.48, 0.00],  # 5 R knee
    [0.00, 0.23, 0.00],    # 6 spine2
    [0.09, -0.88, -0.02],  # 7 L ankle
    [-0.09, -0.88, -0.02], # 8 R ankle
    [0.00, 0.30, 0.00],    # 9 spine3
    [0.11, -0.94, 0.10],   # 10 L foot
    [-0.11, -0.94, 0.10],  # 11 R foot
    [0.00, 0.45, 0.00],    # 12 neck
    [0.08, 0.38, 0.00],    # 13 L collar
    [-0.08, 0.38, 0.00],   # 14 R collar
    [0.00, 0.55, 0.03],    # 15 head
    [0.18, 0.40, 0.00],    # 16 L shoulder
    [-0.18, 0.40, 0.00],   # 17 R shoulder
    [0.42, 0.38, 0.00],    # 18 L elbow
    [-0.42, 0.38, 0.00],   # 19 R elbow
    [0.65, 0.37, 0.00],    # 20 L wrist
    [-0.65, 0.37, 0.00],   # 21 R wrist
    [0.72, 0.36, 0.00],    # 22 L hand
    [-0.72, 0.36, 0.00],   # 23 R hand
], np.float32)


class StaticArray:
    """Identity-hashed wrapper so a numpy array can live in a static
    (non-traced) pytree field. Two wrappers are equal only if they hold
    the same array object — building a new model object recompiles, which
    is the desired behavior for a new mesh."""

    __slots__ = ("val",)

    def __init__(self, val):
        self.val = np.asarray(val)

    def __hash__(self):
        return id(self.val)

    def __eq__(self, other):
        return isinstance(other, StaticArray) and other.val is self.val


@struct.dataclass
class SMPLModel:
    v_template: jnp.ndarray   # (V, 3)
    shapedirs: jnp.ndarray    # (V, 3, B)
    posedirs: jnp.ndarray     # (P, V*3)
    J_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    # static (non-traced) fields — the kinematic tree drives a Python
    # loop unrolled at trace time, so it must survive jit boundaries
    parents: tuple = struct.field(pytree_node=False, default=())
    faces_static: StaticArray = struct.field(pytree_node=False, default=None)

    @property
    def faces(self) -> np.ndarray:
        return self.faces_static.val

    @property
    def n_verts(self) -> int:
        return self.v_template.shape[0]


def make_smpl_model(v_template, shapedirs, posedirs, J_regressor,
                    lbs_weights, parents, faces) -> SMPLModel:
    return SMPLModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(J_regressor, jnp.float32),
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        parents=tuple(int(p) for p in np.asarray(parents).ravel()),
        faces_static=StaticArray(np.asarray(faces, np.int64).reshape(-1, 3)),
    )


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray       # (V, 3)
    joints: jnp.ndarray         # (J, 3)
    A: jnp.ndarray              # (J, 4, 4) per-joint world transforms (rel. T-pose)
    T: jnp.ndarray              # (V, 4, 4) per-vertex skinning transforms
    v_posed: jnp.ndarray        # (V, 3) shaped+pose-corrected rest verts
    v_shaped: jnp.ndarray       # (V, 3)
    shape_offsets: jnp.ndarray  # (V, 3)
    pose_offsets: jnp.ndarray   # (V, 3)
    full_pose: jnp.ndarray      # (J*3,) axis-angle incl. global orient


# ---------------------------------------------------------------- loading

class _ChumpyShim:
    """Minimal stand-in so SMPL pkl files referencing chumpy unpickle."""
    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})


class _SMPLUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyShim
        if module.startswith("scipy.sparse"):
            # Real SMPL pkls store J_regressor as scipy.sparse.csc.
            # csc_matrix (pre-1.8 module path). Resolve against the
            # installed scipy — shimming it instead would make _to_np
            # return the raw `data` nonzeros vector, silently corrupting
            # the regressor.
            import scipy.sparse
            return getattr(scipy.sparse, name)
        return super().find_class(module, name)


def _to_np(x):
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray(), np.float32)
    for attr in ("r", "x", "data"):
        if hasattr(x, attr) and not isinstance(x, np.ndarray):
            try:
                return np.asarray(getattr(x, attr), np.float32)
            except Exception:
                continue
    return np.asarray(x, np.float32)


def load_smpl(path: str) -> SMPLModel:
    """Load SMPL from a directory (containing SMPL_NEUTRAL.pkl),
    a .pkl, or an .npz with standard field names."""
    if os.path.isdir(path):
        for cand in ("SMPL_NEUTRAL.pkl", "SMPL_NEUTRAL.npz",
                     "smpl_neutral.npz"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=True)
        data = {k: z[k] for k in z.files}
    else:
        with open(path, "rb") as f:
            data = _SMPLUnpickler(f, encoding="latin1").load()

    shapedirs = _to_np(data["shapedirs"])[..., :10]
    posedirs = _to_np(data["posedirs"])
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    jreg = _to_np(data["J_regressor"])
    parents = (np.asarray(_to_np(data["kintree_table"])[0], np.int64)
               if "kintree_table" in data else SMPL_PARENTS)
    parents = np.clip(parents, -1, NUM_JOINTS)
    parents[0] = -1
    faces = _to_np(data["f"]) if "f" in data else _to_np(data["faces"])
    return make_smpl_model(
        _to_np(data["v_template"]), shapedirs, posedirs, jreg,
        _to_np(data.get("weights", data.get("lbs_weights"))), parents, faces)


def synthetic_smpl(verts_per_bone: int = 32, seed: int = 0) -> SMPLModel:
    """Deterministic articulated test body: vertices ring-sampled around
    each bone of the real SMPL skeleton, skinning weights split between
    the bone's endpoint joints. Produces a valid SMPLModel with V =
    24*verts_per_bone vertices and zero pose blendshapes."""
    rng = np.random.RandomState(seed)
    joints = _SYNTH_JOINTS
    V = NUM_JOINTS * verts_per_bone
    verts = np.zeros((V, 3), np.float32)
    weights = np.zeros((V, NUM_JOINTS), np.float32)
    for j in range(NUM_JOINTS):
        parent = SMPL_PARENTS[j]
        a = joints[parent] if parent >= 0 else joints[j] + [0, 0.05, 0]
        b = joints[j]
        ts = np.linspace(0.05, 0.95, verts_per_bone)
        axis = b - a
        ortho = rng.randn(verts_per_bone, 3).astype(np.float32)
        axis_n = axis / (np.linalg.norm(axis) + 1e-8)
        ortho -= ortho @ axis_n[:, None] * axis_n[None]
        ortho /= np.linalg.norm(ortho, axis=-1, keepdims=True) + 1e-8
        radius = 0.04
        pts = a[None] + ts[:, None] * axis[None] + radius * ortho
        sl = slice(j * verts_per_bone, (j + 1) * verts_per_bone)
        verts[sl] = pts
        weights[sl, j] = ts
        weights[sl, parent if parent >= 0 else j] += 1.0 - ts

    # J_regressor: joints as weighted averages of the nearest vertices
    jreg = np.zeros((NUM_JOINTS, V), np.float32)
    d = np.linalg.norm(verts[None] - joints[:, None], axis=-1)
    near = np.argsort(d, axis=1)[:, :8]
    for j in range(NUM_JOINTS):
        jreg[j, near[j]] = 1.0 / 8.0

    shapedirs = rng.randn(V, 3, 10).astype(np.float32) * 0.01
    posedirs = np.zeros((NUM_POSE_FEATURES, V * 3), np.float32)
    # a fake triangulation: consecutive triplets along each bone ring
    faces = np.stack([np.arange(V - 2), np.arange(1, V - 1),
                      np.arange(2, V)], axis=1)
    return make_smpl_model(verts, shapedirs, posedirs, jreg,
                           weights / weights.sum(-1, keepdims=True),
                           SMPL_PARENTS, faces)


# ---------------------------------------------------------------- LBS math

def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents: np.ndarray):
    """Kinematic chain composition (smplx semantics).

    rot_mats: (J, 3, 3) local joint rotations; joints: (J, 3) rest joint
    positions. Returns (posed_joints (J, 3), A (J, 4, 4)) where A are the
    relative-to-rest skinning transforms.
    The loop over the 24-joint static tree is unrolled at trace time.
    """
    J = joints.shape[0]
    parents = np.asarray(parents)
    rel_joints = jnp.concatenate(
        [joints[:1], joints[1:] - joints[parents[1:]]], axis=0)

    def make_tf(R, t):
        top = jnp.concatenate([R, t[:, None]], axis=1)       # (3, 4)
        bot = jnp.array([[0.0, 0.0, 0.0, 1.0]])
        return jnp.concatenate([top, bot], axis=0)

    chains = [make_tf(rot_mats[0], rel_joints[0])]
    for j in range(1, J):
        chains.append(jnp.matmul(chains[parents[j]],
                                 make_tf(rot_mats[j], rel_joints[j]),
                                 precision=_HI))
    transforms = jnp.stack(chains)                            # (J, 4, 4)

    posed_joints = transforms[:, :3, 3]
    # subtract rest-joint contribution: A = G - pack(G @ [j, 0])
    joints_hom = jnp.concatenate([joints, jnp.zeros((J, 1))], axis=1)
    correction = jnp.einsum("jab,jb->ja", transforms, joints_hom,
                            precision=_HI)  # (J, 4)
    A = transforms.at[:, :, 3].add(-correction)
    return posed_joints, A


def smpl_forward(model: SMPLModel, betas: jnp.ndarray, body_pose: jnp.ndarray,
                 global_orient: jnp.ndarray,
                 transl: jnp.ndarray | None = None,
                 disable_posedirs: bool = False,
                 vert_offsets: jnp.ndarray | None = None) -> SMPLOutput:
    """Single-sample SMPL forward (vmap for batches).

    betas (B,), body_pose (69,) axis-angle, global_orient (3,).
    """
    full_pose = jnp.concatenate([global_orient.reshape(3),
                                 body_pose.reshape(NUM_BODY_JOINTS * 3)])
    shape_offsets = jnp.einsum("vcb,b->vc", model.shapedirs, betas,
                               precision=_HI)
    v_shaped = model.v_template + shape_offsets
    joints = jnp.matmul(model.J_regressor, v_shaped, precision=_HI)  # (J, 3)

    rot_mats = axis_angle_to_matrix(full_pose.reshape(NUM_JOINTS, 3))
    ident = jnp.eye(3)
    pose_feature = (rot_mats[1:] - ident).reshape(-1)      # (207,)
    if disable_posedirs or model.posedirs.shape[0] == 0:
        pose_offsets = jnp.zeros_like(v_shaped)
    else:
        pose_offsets = jnp.matmul(pose_feature, model.posedirs,
                                  precision=_HI).reshape(-1, 3)
    v_posed = v_shaped + pose_offsets
    if vert_offsets is not None:
        v_posed = v_posed + vert_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, joints, model.parents)

    T = jnp.einsum("vj,jab->vab", model.lbs_weights, A,
                   precision=_HI)    # (V, 4, 4)
    v_hom = jnp.concatenate([v_posed, jnp.ones_like(v_posed[:, :1])], -1)
    verts = jnp.einsum("vab,vb->va", T, v_hom, precision=_HI)[:, :3]
    if transl is not None:
        verts = verts + transl[None]
        posed_joints = posed_joints + transl[None]
    return SMPLOutput(vertices=verts, joints=posed_joints, A=A, T=T,
                      v_posed=v_posed, v_shaped=v_shaped,
                      shape_offsets=shape_offsets, pose_offsets=pose_offsets,
                      full_pose=full_pose)


def lbs_extra(A: jnp.ndarray, points: jnp.ndarray, posedirs: jnp.ndarray | None,
              lbs_weights: jnp.ndarray, full_pose: jnp.ndarray,
              disable_posedirs: bool = False):
    """Skin an arbitrary point set with per-joint transforms A and
    per-point predicted weights (reference lbs_extra, lbs.py:19-73).

    A (J, 4, 4); points (N, 3); posedirs (207, N*3) or None;
    lbs_weights (N, J); full_pose (J*3,) axis-angle.
    Returns (deformed points (N, 3), T (N, 4, 4), v_posed (N, 3)).
    """
    if disable_posedirs or posedirs is None:
        v_posed = points
    else:
        rot_mats = axis_angle_to_matrix(full_pose.reshape(NUM_JOINTS, 3))
        pose_feature = (rot_mats[1:] - jnp.eye(3)).reshape(-1)
        pose_offsets = jnp.matmul(pose_feature, posedirs,
                                  precision=_HI).reshape(-1, 3)
        v_posed = points + pose_offsets

    T = jnp.einsum("nj,jab->nab", lbs_weights, A, precision=_HI)
    v_hom = jnp.concatenate([v_posed, jnp.ones_like(v_posed[:, :1])], -1)
    deformed = jnp.einsum("nab,nb->na", T, v_hom, precision=_HI)[:, :3]
    return deformed, T, v_posed


def vitruvian_pose() -> jnp.ndarray:
    """The HUGS canonical 'vitruvian' body pose: legs spread by +-1 rad
    about z at the hips (reference hugs_trimlp.py:563-577)."""
    pose = jnp.zeros(NUM_BODY_JOINTS * 3)
    pose = pose.at[2].set(1.0)   # left hip z
    pose = pose.at[5].set(-1.0)  # right hip z
    return pose
