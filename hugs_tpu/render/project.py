"""EWA projection of 3D Gaussians to screen space, pure JAX.

This is the 'preprocess' stage of the splatting pipeline — the behavioral
equivalent of the CUDA rasterizer's preprocessCUDA (the diff-gaussian-
rasterization submodule used at hugs/renderer/gs_renderer.py:141-152),
re-derived from the EWA splatting math (Zwicker et al. 2001) as batched
JAX ops so XLA maps the work onto the VPU and gradients come from AD.

Pipeline per Gaussian:
  1. world -> camera point t (row-vector world_view), near-cull at z<=0.2;
  2. world -> NDC via full_proj, to pixel coords;
  3. cov3D = R S S^T R^T; cov2D = J W cov3D W^T J^T + 0.3 I (low-pass);
  4. conic = cov2D^{-1}; radius = ceil(3 sqrt(max eigenvalue));
  5. view-dependent RGB from SH along (mean - campos).

LAYOUT: all math runs on (N,) ROW vectors (the batch axis in VPU lanes).
The naive (N, 3)/(N, 4) formulation pads its 3-wide minor axis to the
128-lane register width — a measured ~40x VPU-width waste on TPU that
made this stage ~1.7 ms instead of ~0.3 ms at 50k Gaussians. Inputs are
transposed once; the row results are emitted BOTH as the API-compatible
(N, k) fields and as the feature-major `feat` (10, N) matrix that the
binning and the Pallas instance pack consume directly (saving their
per-column relayouts).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.ops.sh import eval_sh_rows
from hugs_tpu.render.camera import Camera

# feat row indices (shared with pallas_blend.py's F_* constants)
FEAT_ROWS = 10  # r g b op(masked) mx my ca cb cc rad


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray   # (N, 2) pixel coords
    conic: jnp.ndarray    # (N, 3) packed inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # (N,) camera-space z
    radius: jnp.ndarray   # (N,) float screen-space radius (0 = culled)
    rgb: jnp.ndarray      # (N, 3) view-dependent color
    opacity: jnp.ndarray  # (N,) in [0, 1]
    mask: jnp.ndarray     # (N,) bool: visible (not culled, finite footprint)
    feat: jnp.ndarray | None = None  # (10, N) feature-major cache:
    #   rows r, g, b, opacity*mask, mx, my, ca, cb, cc, rad. Kept in sync
    #   with the fields by construction; anything that edits mean2d must
    #   go through update_mean2d (or set feat=None to invalidate).


def update_mean2d(pg: ProjectedGaussians,
                  delta: jnp.ndarray) -> ProjectedGaussians:
    """mean2d += delta keeping the feat cache in sync (rows 4:6).

    delta: (N, 2) per-Gaussian or broadcastable (2,) (e.g. a band
    shift)."""
    feat = pg.feat
    if feat is not None:
        d = jnp.asarray(delta)
        dT = d.reshape(2, 1) if d.ndim == 1 else d.T
        feat = feat.at[4:6, :].add(dT)
    return pg._replace(mean2d=pg.mean2d + delta, feat=feat)


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
    mT = means3d.T                                   # (3, N) rows
    m0, m1, m2 = mT[0], mT[1], mT[2]

    # --- camera-space position and depth (rows; row-vector convention
    # t = x @ wv[:3, :3] + wv[3, :3], expanded as f32 FMAs — exact, no
    # bf16 matmul in the path) ---
    wv = camera.world_view
    t0 = m0 * wv[0, 0] + m1 * wv[1, 0] + m2 * wv[2, 0] + wv[3, 0]
    t1 = m0 * wv[0, 1] + m1 * wv[1, 1] + m2 * wv[2, 1] + wv[3, 1]
    depth = m0 * wv[0, 2] + m1 * wv[1, 2] + m2 * wv[2, 2] + wv[3, 2]

    # --- pixel-space mean (rows through full_proj; only x, y, w used) ---
    fp = camera.full_proj
    hx = m0 * fp[0, 0] + m1 * fp[1, 0] + m2 * fp[2, 0] + fp[3, 0]
    hy = m0 * fp[0, 1] + m1 * fp[1, 1] + m2 * fp[2, 1] + fp[3, 1]
    hw = m0 * fp[0, 3] + m1 * fp[1, 3] + m2 * fp[2, 3] + fp[3, 3]
    p_w = 1.0 / (hw + 1e-7)
    mx = ndc_to_pixel(hx * p_w, width)
    my = ndc_to_pixel(hy * p_w, height)

    # --- 2D covariance (EWA) ---
    focal_x = width / (2.0 * camera.tan_fovx)
    focal_y = height / (2.0 * camera.tan_fovy)
    # frustum-clamped camera point for a stable Jacobian
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    tz = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    tx = jnp.clip(t0 / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t1 / tz, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # cov2d = (J W^T) Sigma (J W^T)^T expanded in CLOSED FORM over (N,)
    # rows: J is [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]] and
    # Sigma = R diag(s^2) R^T, so with u = row0(J W^T), v = row1(J W^T)
    # and p = diag(s) R^T u^T, q = diag(s) R^T v^T:
    #   cov2d = [[p.p, p.q], [p.q, q.q]].
    # ~50 VPU row ops with an equally cheap AD transpose. Math per the
    # CUDA preprocessCUDA EWA chain (gs_renderer.py:141-152 call site).
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
    qT = rotq.T                                       # (4, N)
    qnorm = jnp.sqrt(qT[0] * qT[0] + qT[1] * qT[1] + qT[2] * qT[2]
                     + qT[3] * qT[3]).clip(1e-12)
    qw, qx, qy, qz = qT[0] / qnorm, qT[1] / qnorm, qT[2] / qnorm, \
        qT[3] / qnorm
    xs, ys, zs = 2.0 * qx, 2.0 * qy, 2.0 * qz
    wx, wy, wz = qw * xs, qw * ys, qw * zs
    xx, xy, xz = qx * xs, qx * ys, qx * zs
    yy, yz, zz = qy * ys, qy * zs, qz * zs
    r00, r01, r02 = 1.0 - (yy + zz), xy - wz, xz + wy
    r10, r11, r12 = xy + wz, 1.0 - (xx + zz), yz - wx
    r20, r21, r22 = xz - wy, yz + wx, 1.0 - (xx + yy)
    sT = scales.T                                     # (3, N)
    s0 = scaling_modifier * sT[0]
    s1 = scaling_modifier * sT[1]
    s2 = scaling_modifier * sT[2]
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
    conic_a = c * inv_det
    conic_b = -b * inv_det
    conic_c = a * inv_det

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

    # --- color from SH (row evaluation; see ops/sh.py eval_sh_rows) ---
    if shs.ndim == 2:
        rgbT = shs.T                                  # (3, N)
    else:
        K = shs.shape[1]
        max_deg = int(round(K ** 0.5)) - 1
        dx = m0 - camera.center[0]
        dy = m1 - camera.center[1]
        dz = m2 - camera.center[2]
        inv_n = 1.0 / jnp.clip(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-8)
        rgbT = jnp.maximum(
            eval_sh_rows(max_deg, jnp.asarray(active_sh_degree),
                         shs.reshape(n, K * 3).T,
                         dx * inv_n, dy * inv_n, dz * inv_n) + 0.5,
            0.0)

    mask = (depth > near) & (det > 0) & (radius > 0)
    if alive is not None:
        mask = mask & alive
    radius = jnp.where(mask, radius, 0.0)

    feat = jnp.stack([rgbT[0], rgbT[1], rgbT[2],
                      jnp.where(mask, opacity, 0.0),
                      mx, my, conic_a, conic_b, conic_c, radius], axis=0)

    return ProjectedGaussians(
        mean2d=jnp.stack([mx, my], axis=-1),
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        depth=depth, radius=radius, rgb=rgbT.T, opacity=opacity,
        mask=mask, feat=feat)
