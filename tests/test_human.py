import jax
import jax.numpy as jnp
import numpy as np

from hugs_tpu.models.smpl import (
    synthetic_smpl, smpl_forward, lbs_extra, vitruvian_pose, SMPL_PARENTS,
)
from hugs_tpu.models.subdivide import subdivide_smpl_model
from hugs_tpu.models import human_gs as hgs
from hugs_tpu.models.human_gs import (
    HumanGSConfig, init_human_gs, canon_forward, human_forward,
    smpl_lbsweight_top_k,
)

BETAS = jnp.zeros(10)
ZPOSE = jnp.zeros(69)
ZORIENT = jnp.zeros(3)


def small_cfg(**kw):
    return HumanGSConfig(n_features=8, triplane_res=32, **kw)


def test_smpl_identity_pose():
    m = synthetic_smpl(verts_per_bone=16)
    out = smpl_forward(m, BETAS, ZPOSE, ZORIENT)
    # zero pose, zero betas => verts == template (posedirs are zero)
    np.testing.assert_allclose(out.vertices, m.v_template, atol=1e-5)
    # A transforms are identity
    np.testing.assert_allclose(out.A, np.tile(np.eye(4), (24, 1, 1)),
                               atol=1e-5)


def test_smpl_global_orient_rotates_everything():
    m = synthetic_smpl(verts_per_bone=16)
    orient = jnp.array([0.0, 0.0, np.pi / 2])
    out = smpl_forward(m, BETAS, ZPOSE, orient)
    # the whole body rotates about the root joint by Rz(90)
    root = (m.J_regressor @ m.v_template)[0]
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    expect = (np.asarray(m.v_template) - np.asarray(root)) @ Rz.T + np.asarray(root)
    np.testing.assert_allclose(out.vertices, expect, atol=1e-4)


def test_smpl_elbow_moves_only_arm():
    m = synthetic_smpl(verts_per_bone=16)
    pose = jnp.zeros(69).at[(18 - 1) * 3 + 2].set(1.0)  # L elbow about z
    out = smpl_forward(m, BETAS, pose, ZORIENT)
    moved = np.linalg.norm(np.asarray(out.vertices - m.v_template), axis=-1)
    w = np.asarray(m.lbs_weights)
    # directly-weighted verts move, root-torso verts don't
    arm_verts = w[:, 20] > 0.5     # wrist-weighted (below elbow in chain)
    torso_verts = w[:, 0] > 0.5
    assert moved[arm_verts].min() > 1e-3
    assert moved[torso_verts].max() < 1e-5


def test_lbs_extra_matches_smpl_forward():
    m = synthetic_smpl(verts_per_bone=16)
    pose = jax.random.normal(jax.random.PRNGKey(0), (69,)) * 0.3
    orient = jax.random.normal(jax.random.PRNGKey(1), (3,)) * 0.3
    out = smpl_forward(m, BETAS, pose, orient)
    # skinning v_shaped with A + template weights must reproduce vertices
    verts2, T2, _ = lbs_extra(out.A, out.v_shaped, None, m.lbs_weights,
                              out.full_pose, disable_posedirs=True)
    np.testing.assert_allclose(verts2, out.vertices, atol=1e-4)
    np.testing.assert_allclose(T2, out.T, atol=1e-5)


def test_subdivision_counts_and_weights():
    m = synthetic_smpl(verts_per_bone=8)
    v0, f0 = m.n_verts, m.faces.shape[0]
    m2 = subdivide_smpl_model(m, smoothing=True, n_iter=1)
    assert m2.faces.shape[0] == 4 * f0
    assert m2.n_verts > v0
    np.testing.assert_allclose(np.asarray(m2.lbs_weights).sum(-1), 1.0,
                               atol=1e-5)
    assert m2.posedirs.shape == (207, m2.n_verts * 3)


def test_knn_weight_transfer_exact_at_template():
    m = synthetic_smpl(verts_per_bone=16)
    pts = m.v_template[::5]
    _, w = smpl_lbsweight_top_k(m.lbs_weights, pts, m.v_template, K=6)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # at exact template points the nearest neighbor dominates (dist 0)
    # confidence gating keeps only agreeing neighbors
    err = np.abs(np.asarray(w) - np.asarray(m.lbs_weights[::5])).max()
    assert err < 0.35  # confidence-gated mixture, not exact — sanity bound


def test_human_model_init_and_forward():
    key = jax.random.PRNGKey(0)
    smpl = synthetic_smpl(verts_per_bone=16)
    cfg = small_cfg(use_deformer=True, disable_posedirs=True)
    params, state, fixed, init_values = init_human_gs(
        key, cfg, smpl, smpl, BETAS, n_frames=3, capacity=512)
    n = smpl.n_verts
    assert int(state.alive.sum()) == n

    out = canon_forward(params, state, cfg)
    assert out["shs"].shape == (512, 16, 3)
    assert out["lbs_weights"].shape == (512, 24)
    np.testing.assert_allclose(np.asarray(out["lbs_weights"].sum(-1)), 1.0,
                               atol=1e-5)

    pose = jax.random.normal(jax.random.PRNGKey(2), (69,)) * 0.2
    fwd = human_forward(params, state, fixed, cfg, global_orient=ZORIENT,
                        body_pose=pose, betas=BETAS, transl=jnp.zeros(3),
                        smpl_scale=jnp.float32(1.0), dataset_idx=0)
    for k in ("xyz", "scales", "rotq", "shs", "opacity"):
        assert np.isfinite(np.asarray(fwd[k])).all(), k
    assert fwd["gt_lbs_weights"] is not None


def test_human_forward_learned_pose_and_ext_tfs():
    key = jax.random.PRNGKey(1)
    smpl = synthetic_smpl(verts_per_bone=16)
    cfg = small_cfg(use_deformer=False)
    params, state, fixed, _ = init_human_gs(
        key, cfg, smpl, smpl, BETAS, n_frames=4, capacity=smpl.n_verts)
    # learned-pose path (all args None -> index into learned params)
    fwd = human_forward(params, state, fixed, cfg, dataset_idx=2)
    assert np.isfinite(np.asarray(fwd["xyz"])).all()
    # ext_tfs applies rigid transform
    R = jnp.eye(3)
    tr = jnp.array([1.0, 2.0, 3.0])
    fwd2 = human_forward(params, state, fixed, cfg, dataset_idx=2,
                         ext_tfs=(tr, R, jnp.float32(1.0)))
    np.testing.assert_allclose(fwd2["xyz"], fwd["xyz"] + tr, atol=1e-5)


def test_distillation_reduces_loss():
    from hugs_tpu.train.human_step import distill_init, _distill_step, \
        init_human_train_state
    key = jax.random.PRNGKey(0)
    smpl = synthetic_smpl(verts_per_bone=8)
    cfg = small_cfg(use_deformer=True, disable_posedirs=True)
    params, state, fixed, init_values = init_human_gs(
        key, cfg, smpl, smpl, BETAS, n_frames=1, capacity=smpl.n_verts)
    targets = {k: v for k, v in init_values.items() if k != "edges"}
    ts = init_human_train_state(params, state)
    _, loss0 = _distill_step(ts, targets, jnp.float32(1e-3), cfg)
    p2 = distill_init(params, state, init_values, cfg, num_steps=150,
                      lr=1e-3)
    ts2 = init_human_train_state(p2, state)
    _, loss1 = _distill_step(ts2, targets, jnp.float32(1e-3), cfg)
    assert float(loss1) < float(loss0) * 0.5, (float(loss0), float(loss1))


def test_forward_with_cached_canon_matches():
    """The forward_test fast path (canon decode cached) must equal the
    full forward (reference forward_test vs forward parity)."""
    key = jax.random.PRNGKey(3)
    smpl = synthetic_smpl(verts_per_bone=12)
    cfg = small_cfg(use_deformer=True, disable_posedirs=True)
    params, state, fixed, _ = init_human_gs(
        key, cfg, smpl, smpl, BETAS, n_frames=2, capacity=smpl.n_verts)
    pose = jax.random.normal(jax.random.PRNGKey(4), (69,)) * 0.2
    kw = dict(global_orient=ZORIENT, body_pose=pose, betas=BETAS,
              transl=jnp.zeros(3), smpl_scale=jnp.float32(1.2),
              dataset_idx=0)
    full = human_forward(params, state, fixed, cfg, **kw)
    from hugs_tpu.models.human_gs import canon_forward
    cached = canon_forward(params, state, cfg)
    fast = human_forward(params, state, fixed, cfg, canon_out=cached, **kw)
    for k in ("xyz", "scales", "rotq", "shs", "opacity"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(full[k]),
                                   atol=1e-6, err_msg=k)


def test_load_smpl_real_format_pkl(tmp_path):
    """load_smpl against a pkl that mimics the REAL SMPL_NEUTRAL.pkl
    wire format (no datasets ship in this env): chumpy-referencing
    arrays for v_template/shapedirs/posedirs/weights, J_regressor as a
    scipy.sparse csc_matrix pickled under the pre-1.8 module path
    `scipy.sparse.csc`, and a uint32 kintree_table whose root parent is
    4294967295 (uint32 -1) — all quirks of the shipped basicmodel pkl
    (reference loads it via smplx at hugs/models/modules/smpl_layer.py)."""
    import pickle
    import sys
    import types

    import scipy.sparse as sp

    from hugs_tpu.models.smpl import (load_smpl, smpl_forward,
                                      NUM_JOINTS, NUM_POSE_FEATURES)

    rng = np.random.RandomState(3)
    V = 64
    v_template = rng.randn(V, 3).astype(np.float64)
    shapedirs = rng.randn(V, 3, 10).astype(np.float64) * 0.01
    posedirs = rng.randn(V, 3, NUM_POSE_FEATURES).astype(np.float64) * 0.001
    weights = rng.rand(V, NUM_JOINTS).astype(np.float64)
    weights /= weights.sum(-1, keepdims=True)
    jreg_dense = np.zeros((NUM_JOINTS, V))
    jreg_dense[np.arange(NUM_JOINTS), rng.permutation(V)[:NUM_JOINTS]] = 1.0
    kintree = np.zeros((2, NUM_JOINTS), np.uint32)
    kintree[0] = np.asarray(SMPL_PARENTS, np.int64).astype(np.uint32)
    kintree[1] = np.arange(NUM_JOINTS, dtype=np.uint32)
    assert kintree[0, 0] == 4294967295  # the real file's uint32 -1 root
    faces = rng.randint(0, V, (100, 3)).astype(np.uint32)

    # a stand-in chumpy: pickles BY REFERENCE to module "chumpy.ch",
    # state dict carrying the backing array under 'x' like real Ch
    chmod = types.ModuleType("chumpy")
    chsub = types.ModuleType("chumpy.ch")

    class Ch:                                   # noqa: N801
        def __init__(self, x):
            self.x = x

        def __reduce__(self):
            return (_ch_new, (), {"x": self.x, "dterms": ("x",)})

    def _ch_new():
        return Ch.__new__(Ch)

    Ch.__module__ = _ch_new.__module__ = "chumpy.ch"
    Ch.__qualname__, _ch_new.__qualname__ = "Ch", "_ch_new"
    chsub.Ch, chsub._ch_new = Ch, _ch_new
    chmod.ch, chmod.Ch = chsub, Ch
    sys.modules["chumpy"], sys.modules["chumpy.ch"] = chmod, chsub
    try:
        data = {
            "v_template": Ch(v_template), "shapedirs": Ch(shapedirs),
            "posedirs": Ch(posedirs), "weights": Ch(weights),
            "J_regressor": sp.csc_matrix(jreg_dense),
            "kintree_table": kintree, "f": faces,
            "bs_style": "lbs", "bs_type": "lrotmin",
        }
        blob = pickle.dumps(data, protocol=2)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]
    # rewrite the sparse class reference to the legacy module path the
    # real file uses (protocol 2 GLOBAL opcodes are newline-framed text)
    blob = blob.replace(b"scipy.sparse._csc", b"scipy.sparse.csc")
    assert b"scipy.sparse.csc" in blob and b"chumpy.ch" in blob

    path = tmp_path / "SMPL_NEUTRAL.pkl"
    path.write_bytes(blob)

    # loads with neither chumpy installed nor the legacy scipy module
    m = load_smpl(str(tmp_path))                # directory form
    np.testing.assert_allclose(np.asarray(m.v_template),
                               v_template.astype(np.float32), atol=0)
    np.testing.assert_allclose(np.asarray(m.J_regressor),
                               jreg_dense.astype(np.float32), atol=0)
    np.testing.assert_allclose(np.asarray(m.lbs_weights),
                               weights.astype(np.float32), atol=0)
    np.testing.assert_allclose(
        np.asarray(m.posedirs),
        posedirs.reshape(-1, NUM_POSE_FEATURES).T.astype(np.float32),
        atol=0)
    assert m.parents == tuple(int(p) for p in np.asarray(SMPL_PARENTS))
    assert m.faces.shape == (100, 3)

    # and the loaded model drives the LBS forward
    out = smpl_forward(m, jnp.zeros(10), jnp.zeros(69), jnp.zeros(3))
    assert np.isfinite(np.asarray(out.vertices)).all()
    assert out.joints.shape == (NUM_JOINTS, 3)
