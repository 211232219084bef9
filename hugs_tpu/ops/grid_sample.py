"""Bilinear 2D grid sampling, pure JAX (gather-based).

TPU-native equivalent of torch.nn.functional.grid_sample for the triplane
feature lookup (reference: hugs/models/modules/triplane.py:35-37), with
align_corners=True semantics: grid coords in [-1, 1] map to pixel-center
coords [0, S-1]. Out-of-range samples are clamped to the border (the
triplane asserts in-range inputs, so border vs zeros padding is
unobservable in-distribution; clamping keeps gradients defined).
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample a feature plane at continuous 2D locations.

    Args:
      plane: (H, W, C) feature image. NOTE: torch's grid_sample convention
        indexes grid x along W and grid y along H.
      coords: (N, 2) in [-1, 1]; coords[:, 0] = x (W axis), coords[:, 1] = y.

    Returns:
      (N, C) bilinearly interpolated features, differentiable w.r.t. both
      plane and coords.
    """
    H, W, _ = plane.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0.astype(x.dtype))[:, None]
    wy = (y - y0.astype(y.dtype))[:, None]

    # Flatten to 1D gathers (one big take per corner — XLA lowers to
    # efficient dynamic-gather on TPU).
    flat = plane.reshape(H * W, -1)
    f00 = flat[y0 * W + x0]
    f01 = flat[y0 * W + x1]
    f10 = flat[y1 * W + x0]
    f11 = flat[y1 * W + x1]

    top = f00 * (1.0 - wx) + f01 * wx
    bot = f10 * (1.0 - wx) + f11 * wx
    return top * (1.0 - wy) + bot * wy
