"""Reference (oracle) renderer: dense per-pixel alpha blending, pure JAX.

Slow-but-exact O(N * H * W) renderer used as the correctness oracle for the
tiled/Pallas render path (SURVEY.md §7 layer 2). Differentiable end-to-end
via AD — its jax.grad is also the gradient oracle.

Blending semantics (shared by every backend in this framework):
  alpha_i = min(0.99, opacity_i * exp(-0.5 d^T Conic d))
  alpha_i := 0 where the Gaussian-space power > 0 or alpha_i < 1/255
  T_i     = prod_{j<i} (1 - alpha_j)          (exclusive transmittance)
  C(p)    = sum_i rgb_i * alpha_i * T_i * [T_i >= T_EPS]
            + bg * T_fin * [T_fin >= T_EPS]
in front-to-back depth order, with T_EPS = 1e-4. The [T_i >= T_EPS]
indicator is the order-independent (prefix-expressible) formulation of
the CUDA rasterizer's `T < 1e-4 -> done` early termination (renderCUDA
in diff-gaussian-rasterization, used at hugs/renderer/gs_renderer.py:
141-152): once transmittance drops below 1e-4, later splats and the
background contribute nothing — which lets the Pallas backend skip
saturated chunk streams entirely while agreeing with this oracle to fp
tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from hugs_tpu.render.project import ProjectedGaussians

MIN_ALPHA = 1.0 / 255.0
MAX_ALPHA = 0.99
T_EPS = 1e-4                      # CUDA-parity transmittance cutoff
LOG_TEPS = float(jnp.log(1e-4))   # = -9.2103...


def gaussian_alpha(mean2d, conic, opacity, px, py, radius=None):
    """alpha of one set of Gaussians (..., 2)/(...,3)/(...) at pixel centers
    px, py (broadcastable). Returns clamped, cutoff-applied alpha.

    If `radius` is given, contributions beyond the screen-space radius are
    zeroed. This makes the blend definition independent of tiling: any
    pixel within `radius` of the mean lies inside the Gaussian's covered
    tile rectangle, so tiled/Pallas backends see exactly the same support
    as the dense oracle.
    """
    dx = mean2d[..., 0] - px
    dy = mean2d[..., 1] - py
    power = -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy) \
        - conic[..., 1] * dx * dy
    alpha = jnp.minimum(MAX_ALPHA, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    keep = (power <= 0.0) & (alpha >= MIN_ALPHA)
    if radius is not None:
        keep = keep & (dx * dx + dy * dy <= radius * radius)
    return jnp.where(keep, alpha, 0.0)


def render_oracle(pg: ProjectedGaussians, width: int, height: int,
                  bg: jnp.ndarray) -> jnp.ndarray:
    """Render (H, W, 3). Dense: every Gaussian against every pixel."""
    # Depth-sort front to back; culled Gaussians pushed to the back with
    # zero opacity so they contribute nothing.
    depth = jnp.where(pg.mask, pg.depth, jnp.inf)
    order = jnp.argsort(depth)
    mean2d = pg.mean2d[order]
    conic = pg.conic[order]
    rgb = pg.rgb[order]
    opac = jnp.where(pg.mask, pg.opacity, 0.0)[order]
    radius = pg.radius[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)           # (H, W)
    p = jnp.stack([px.ravel(), py.ravel()])  # (2, P)

    # (N, P) alphas
    alpha = gaussian_alpha(mean2d[:, None, :], conic[:, None, :],
                           opac[:, None], p[0][None, :], p[1][None, :],
                           radius=radius[:, None])
    # exclusive transmittance via cumsum in log space
    log_t = jnp.cumsum(jnp.log1p(-alpha), axis=0)
    log_t_excl = jnp.concatenate(
        [jnp.zeros((1, alpha.shape[1])), log_t[:-1]], axis=0)
    trans = jnp.exp(log_t_excl)
    # [T_i >= T_EPS] early-termination indicator (see module docstring)
    w = alpha * trans * (log_t_excl >= LOG_TEPS)        # (N, P)
    color = jax.lax.dot_general(             # (3, P), full f32
        rgb, w, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    if alpha.shape[0]:
        final_t = jnp.exp(log_t[-1]) * (log_t[-1] >= LOG_TEPS)
    else:
        final_t = jnp.ones(alpha.shape[1])
    img = color + bg[:, None] * final_t[None, :]
    return jnp.clip(img.reshape(3, height, width).transpose(1, 2, 0), 0.0, 1.0)
