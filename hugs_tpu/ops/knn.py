"""Brute-force k-nearest-neighbor search, pure JAX (MXU-friendly).

TPU-native replacement for the reference's CUDA kNN dependencies:
  - simple-knn `distCUDA2` (used once at scene init,
    hugs/models/scene.py:181-182) -> `mean_sq_dist_to_knn`.
  - pytorch3d `knn_points` (LBS weight transfer,
    hugs/models/hugs_wo_trimlp.py:60,99) -> `knn`.

Distances are computed as a single big matmul (||a-b||^2 = |a|^2 + |b|^2
- 2 a.b) which XLA tiles onto the MXU; top-k via jax.lax.top_k. For the
point-set sizes here (1e4-1e6 queries x ~1e5 refs) a chunked scan keeps the
distance matrix in manageable blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, 3) x (N, 3) -> (M, N) squared distances via matmul."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    # HIGHEST is load-bearing: |a|^2 + |b|^2 - 2ab is a catastrophic
    # cancellation for NEAR pairs (the ones knn returns); the TPU's
    # default bf16 matmul error (~|a||b| 2^-8) swamps true distances,
    # which corrupts create_from_pcd's init scales on hardware.
    d = a2 + b2.T - 2.0 * jnp.matmul(a, b.T,
                                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(d, 0.0)


def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int,
        chunk: int = 4096) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest refs for each query point.

    Returns (sq_dists (M, k), indices (M, k)), ascending by distance.
    Queries are processed in chunks of `chunk` via lax.map to bound the
    (chunk, N) distance-block memory.
    """
    m = query.shape[0]
    # center the cloud first: distances are translation-invariant, and
    # the expanded form loses all precision when |p|^2 >> nn-dist^2
    # (f32 eps of |p|^2 bounds the resolvable distance; an off-origin
    # cluster at |p|=5 with 2e-3 spacing is otherwise pure noise even
    # at HIGHEST). Centering shrinks |p| to the cloud extent.
    mu = jnp.mean(ref, axis=0, keepdims=True)
    query = query - mu
    ref = ref - mu
    pad = (-m) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)

    def one_chunk(qc):
        d = _pairwise_sq_dist(qc, ref)
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    dists, idxs = jax.lax.map(one_chunk, q)
    return dists.reshape(-1, k)[:m], idxs.reshape(-1, k)[:m]


def mean_sq_dist_to_knn(points: jnp.ndarray, k: int = 3,
                        chunk: int = 4096) -> jnp.ndarray:
    """Mean squared distance of each point to its k nearest OTHER points.

    Equivalent of simple-knn's distCUDA2 as used at Gaussian init
    (hugs/models/scene.py:181): scales = log(sqrt(clamp(distCUDA2(pts)))).
    Excludes self by taking k+1 neighbors and dropping the nearest (self).
    """
    d, _ = knn(points, points, k + 1, chunk=chunk)
    return jnp.mean(d[:, 1:], axis=-1)
