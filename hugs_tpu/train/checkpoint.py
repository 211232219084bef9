"""Checkpoint save/restore via orbax.

Mirrors the reference's checkpoint content (state_dict incl. optimizer
moments and densification stats, scene.py:70-104 / hugs_trimlp.py:152-195)
and its auto-resume-from-latest behavior (gs_trainer.py:134-138,163-167),
as whole-train-state pytrees. PLY export for 3DGS-ecosystem interop lives
in utils/ply.py.
"""
from __future__ import annotations

import os
import re
import warnings

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(ckpt_dir: str, iter_s: str, human=None, scene=None):
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    if human is not None:
        ckptr.save(os.path.join(os.path.abspath(ckpt_dir),
                                f"human_{iter_s}"),
                   _to_numpy_tree(human), force=True)
    if scene is not None:
        ckptr.save(os.path.join(os.path.abspath(ckpt_dir),
                                f"scene_{iter_s}"),
                   _to_numpy_tree(scene), force=True)


def _latest(ckpt_dir: str, prefix: str):
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if d.startswith(prefix + "_")]
    if not cands:
        return None

    def keyf(d):
        m = re.search(r"(\d+)$", d)
        return (1, 10 ** 9) if d.endswith("final") else \
            (0, int(m.group(1)) if m else -1)
    return os.path.join(ckpt_dir, sorted(cands, key=keyf)[-1])


# Per-FRAME learned parameters (leading axis = len(train_dataset)): an
# eval-time trainer has no train split, so these legitimately differ in
# shape. Validation uses the dataset's SMPL parameters, not these
# (reference gs_trainer.py:468-477), so keeping the template values is
# correct — everything else must match exactly.
_PER_FRAME_KEYS = ("global_orient", "body_pose", "transl")


def _restore_checked(ckptr, path, template, what):
    """Restore one train state, refusing shape mismatches.

    A checkpoint written at a different static capacity (or model
    config) restores cleanly through orbax but would silently swap the
    run's fixed-capacity arrays for the checkpoint's — every jitted
    step then retraces at the wrong capacity and the cfg lies about the
    run. Fail loudly instead: auto-resume must only resume the SAME
    run shape. Per-frame pose parameters (_PER_FRAME_KEYS) are the one
    tolerated mismatch (kept at template values, with a warning)."""
    restored = ckptr.restore(os.path.abspath(path),
                             item=_to_numpy_tree(template))
    bad = []

    def chk(p, a, b):
        if np.shape(a) == np.shape(b):
            return b
        keys = jax.tree_util.keystr(p)
        if any(k in keys for k in _PER_FRAME_KEYS):
            warnings.warn(
                f"checkpoint {what}{keys}: per-frame params "
                f"{np.shape(b)} don't fit this trainer's {np.shape(a)} "
                f"(different split length); keeping initial values — "
                f"dataset SMPL parameters drive eval", stacklevel=2)
            return np.asarray(a)
        bad.append(f"{keys}: ckpt {np.shape(b)} != run {np.shape(a)}")
        return b
    merged = jax.tree_util.tree_map_with_path(chk, template, restored)
    if bad:
        raise ValueError(
            f"checkpoint {path} does not match the current {what} state "
            f"(different capacity/config?): " + "; ".join(bad[:5])
            + (f" (+{len(bad) - 5} more)" if len(bad) > 5 else ""))
    return jax.tree.map(lambda a, b: jax.numpy.asarray(b), template,
                        merged)


def load_latest(ckpt_dir: str, human=None, scene=None):
    """Restore into the structure of the given train states. Returns
    (human, scene) with None for missing parts, or None if nothing
    found. Raises ValueError if the latest checkpoint's array shapes do
    not match the given states (e.g. a different static capacity)."""
    ckptr = ocp.PyTreeCheckpointer()
    h_path = _latest(ckpt_dir, "human")
    s_path = _latest(ckpt_dir, "scene")
    if h_path is None and s_path is None:
        return None
    h = s = None
    if h_path is not None and human is not None:
        h = _restore_checked(ckptr, h_path, human, "human")
    if s_path is not None and scene is not None:
        s = _restore_checked(ckptr, s_path, scene, "scene")
    return h, s
