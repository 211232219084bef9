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

import jax
import jax.numpy as jnp

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
    # HIGHEST: TPU matmuls default to bf16; positions feed pixel coords,
    # where 2^-8 relative error is whole pixels. K=3/4 so HIGHEST is free.
    hp = jnp.matmul
    HI = jax.lax.Precision.HIGHEST
    wv = camera.world_view
    t = hp(means3d, wv[:3, :3], precision=HI) + wv[3, :3]
    depth = t[..., 2]

    # --- pixel-space mean ---
    hom = hp(jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)],
                             -1), camera.full_proj, precision=HI)
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
    # cov2d = (J W^T) Sigma (J W^T)^T expanded in CLOSED FORM over (N,)
    # vectors: J is [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]] and
    # Sigma = R diag(s^2) R^T, so with u = row0(J W^T), v = row1(J W^T)
    # and p = diag(s) R^T u^T, q = diag(s) R^T v^T:
    #   cov2d = [[p.p, p.q], [p.q, q.q]].
    # Batched (N,2,3)@(N,3,3) matmuls lower to tiny-matrix MXU ops on TPU
    # (and their AD transposes dominated the projection backward); this
    # formulation is ~50 VPU elementwise ops with an equally cheap
    # backward. Math per the CUDA preprocessCUDA EWA chain
    # (hugs/renderer/gs_renderer.py:141-152 call site).
    a1 = focal_x * inv_z
    a2 = -focal_x * tx * inv_z2
    b1 = focal_y * inv_z
    b2 = -focal_y * ty * inv_z2
    # camera = x @ W3 (row-vector) => d t / d x = W3^T; rows of J @ W3^T
    # mix constant wv columns
    u0 = a1 * wv[0, 0] + a2 * wv[0, 2]
    u1 = a1 * wv[1, 0] + a2 * wv[1, 2]
    u2 = a1 * wv[2, 0] + a2 * wv[2, 2]
    v0 = b1 * wv[0, 1] + b2 * wv[0, 2]
    v1 = b1 * wv[1, 1] + b2 * wv[1, 2]
    v2 = b1 * wv[2, 1] + b2 * wv[2, 2]
    # rotation entries from the unit quaternion (same formulas/guard as
    # ops.rotations.quat_to_matrix on the normalized quaternion)
    qn = rotq / jnp.linalg.norm(rotq, axis=-1, keepdims=True).clip(1e-12)
    qw, qx, qy, qz = qn[..., 0], qn[..., 1], qn[..., 2], qn[..., 3]
    xs, ys, zs = 2.0 * qx, 2.0 * qy, 2.0 * qz
    wx, wy, wz = qw * xs, qw * ys, qw * zs
    xx, xy, xz = qx * xs, qx * ys, qx * zs
    yy, yz, zz = qy * ys, qy * zs, qz * zs
    r00, r01, r02 = 1.0 - (yy + zz), xy - wz, xz + wy
    r10, r11, r12 = xy + wz, 1.0 - (xx + zz), yz - wx
    r20, r21, r22 = xz - wy, yz + wx, 1.0 - (xx + yy)
    s0 = scaling_modifier * scales[..., 0]
    s1 = scaling_modifier * scales[..., 1]
    s2 = scaling_modifier * scales[..., 2]
    p0 = s0 * (r00 * u0 + r10 * u1 + r20 * u2)
    p1 = s1 * (r01 * u0 + r11 * u1 + r21 * u2)
    p2 = s2 * (r02 * u0 + r12 * u1 + r22 * u2)
    q0 = s0 * (r00 * v0 + r10 * v1 + r20 * v2)
    q1 = s1 * (r01 * v0 + r11 * v1 + r21 * v2)
    q2 = s2 * (r02 * v0 + r12 * v1 + r22 * v2)
    a = p0 * p0 + p1 * p1 + p2 * p2 + 0.3
    c = q0 * q0 + q1 * q1 + q2 * q2 + 0.3
    b = p0 * q0 + p1 * q1 + p2 * q2

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    # opacity-aware extent: the blend drops alpha < MIN_ALPHA (1/255),
    # so the bounding radius only needs to cover alpha >= MIN_ALPHA:
    # alpha >= 1/255  ⇔  0.5 d'Σ⁻¹d <= ln(255 op)  ⇒  d² <= 2 λ1
    # ln(255 op) (λ1 = max eigenvalue). Capped at the CUDA 3σ bound
    # (reference cuda_rasterizer/forward.cu computeCov2D): images are
    # identical — every pixel the tighter circle cuts already failed the
    # alpha test — but low-opacity Gaussians produce strictly fewer tile
    # instances (op <= 1/255 culls outright: it can never pass the
    # alpha test anywhere).
    lim = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)
    k3 = jnp.sqrt(jnp.clip(lim, 0.0, 9.0))
    radius = jnp.ceil(k3 * jnp.sqrt(lam1))

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
