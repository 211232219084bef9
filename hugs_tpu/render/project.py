"""EWA projection of 3D Gaussians to screen space, pure JAX.

This is the 'preprocess' stage of the splatting pipeline — the behavioral
equivalent of the CUDA rasterizer's preprocessCUDA (the diff-gaussian-
rasterization submodule used at hugs/renderer/gs_renderer.py:141-152),
re-derived from the EWA splatting math (Zwicker et al. 2001) as batched
JAX ops so XLA maps the einsums onto the MXU and gradients come from AD.

Pipeline per Gaussian:
  1. world -> camera point t (row-vector world_view), near-cull at z<=0.2;
  2. world -> NDC via full_proj, to pixel coords;
  3. cov3D = R S S^T R^T; cov2D = J W cov3D W^T J^T + 0.3 I (low-pass);
  4. conic = cov2D^{-1}; radius = ceil(3 sqrt(max eigenvalue));
  5. view-dependent RGB from SH along (mean - campos).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hugs_tpu.ops.covariance import covariance_from_scaling_rotation
from hugs_tpu.ops.sh import eval_sh_masked
from hugs_tpu.render.camera import Camera


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray   # (N, 2) pixel coords
    conic: jnp.ndarray    # (N, 3) packed inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # (N,) camera-space z
    radius: jnp.ndarray   # (N,) float screen-space radius (0 = culled)
    rgb: jnp.ndarray      # (N, 3) view-dependent color
    opacity: jnp.ndarray  # (N,) in [0, 1]
    mask: jnp.ndarray     # (N,) bool: visible (not culled, finite footprint)


def ndc_to_pixel(ndc: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1, 1] -> continuous pixel coordinate (3DGS convention)."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,      # (N, 3)
    scales: jnp.ndarray,       # (N, 3) (already exp-activated)
    rotq: jnp.ndarray,         # (N, 4) unit quaternions wxyz
    opacity: jnp.ndarray,      # (N,) or (N, 1)
    shs: jnp.ndarray,          # (N, K, 3) SH coeffs or (N, 3) precomputed rgb
    camera: Camera,
    width: int,
    height: int,
    active_sh_degree: jnp.ndarray | int = 0,
    scaling_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,  # (N,) bool capacity mask
    near: float = 0.2,
) -> ProjectedGaussians:
    opacity = opacity.reshape(-1)
    n = means3d.shape[0]

    # --- camera-space position and depth ---
    wv = camera.world_view
    t = means3d @ wv[:3, :3] + wv[3, :3]
    depth = t[..., 2]

    # --- pixel-space mean ---
    hom = jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)], -1) @ camera.full_proj
    p_w = 1.0 / (hom[..., 3] + 1e-7)
    ndc = hom[..., :3] * p_w[..., None]
    mean2d = jnp.stack(
        [ndc_to_pixel(ndc[..., 0], width), ndc_to_pixel(ndc[..., 1], height)], -1)

    # --- 2D covariance (EWA) ---
    focal_x = width / (2.0 * camera.tan_fovx)
    focal_y = height / (2.0 * camera.tan_fovy)
    # frustum-clamped camera point for a stable Jacobian
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    tz = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    tx = jnp.clip(t[..., 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[..., 1] / tz, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(inv_z)
    # J: (N, 2, 3) Jacobian of (u, v) = (fx x/z, fy y/z)
    J = jnp.stack([
        jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], -1),
        jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], -1),
    ], -2)
    # camera = x @ W3 (row-vector) => d t / d x = W3^T
    W3t = wv[:3, :3].T
    cov3d = covariance_from_scaling_rotation(scales, rotq, scaling_modifier)
    M = J @ (W3t @ cov3d @ W3t.T)           # (N, 2, 3)
    cov2d = M @ jnp.swapaxes(J, -1, -2)     # (N, 2, 2)
    a = cov2d[..., 0, 0] + 0.3
    c = cov2d[..., 1, 1] + 0.3
    b = 0.5 * (cov2d[..., 0, 1] + cov2d[..., 1, 0])

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # --- color from SH ---
    if shs.ndim == 2:
        rgb = shs
    else:
        K = shs.shape[1]
        max_deg = int(round(K ** 0.5)) - 1
        dirs = means3d - camera.center
        dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        # shs layout (N, K, 3) -> eval over coefficient axis
        sh_cn = jnp.swapaxes(shs, -1, -2)  # (N, 3, K)
        rgb = jnp.maximum(
            eval_sh_masked(max_deg, jnp.asarray(active_sh_degree), sh_cn, dirs) + 0.5,
            0.0)

    mask = (depth > near) & (det > 0) & (radius > 0)
    if alive is not None:
        mask = mask & alive
    radius = jnp.where(mask, radius, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d, conic=conic, depth=depth, radius=radius,
        rgb=rgb, opacity=opacity, mask=mask)
