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


def load_latest(ckpt_dir: str, human=None, scene=None):
    """Restore into the structure of the given train states. Returns
    (human, scene) with None for missing parts, or None if nothing found."""
    ckptr = ocp.PyTreeCheckpointer()
    h_path = _latest(ckpt_dir, "human")
    s_path = _latest(ckpt_dir, "scene")
    if h_path is None and s_path is None:
        return None
    h = s = None
    if h_path is not None and human is not None:
        h = ckptr.restore(os.path.abspath(h_path),
                          item=_to_numpy_tree(human))
        h = jax.tree.map(lambda a, b: jax.numpy.asarray(b), human, h)
    if s_path is not None and scene is not None:
        s = ckptr.restore(os.path.abspath(s_path),
                          item=_to_numpy_tree(scene))
        s = jax.tree.map(lambda a, b: jax.numpy.asarray(b), scene, s)
    return h, s
