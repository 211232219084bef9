"""Real spherical harmonics evaluation for Gaussian-splat view-dependent color.

Semantics match the reference's eval_sh (hugs/utils/spherical_harmonics.py:61-125)
for degrees 0..3 (the 3DGS color path): given SH coefficients laid out
(..., C, (deg+1)^2) and unit view directions (..., 3), return colors (..., C).
Hard-coded real-SH constants (standard in the 3DGS literature).
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
      deg: 0..3 (static python int — selects how many bands contribute).
      sh: (..., C, (deg+1)^2) coefficients.
      dirs: (..., 3) unit directions (broadcastable against sh's batch dims).

    Returns:
      (..., C) channel values (NOT clamped; caller adds 0.5 per 3DGS).
    """
    assert 0 <= deg <= 4
    result = C0 * sh[..., 0]
    if deg >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result
                  - C1 * y * sh[..., 1]
                  + C1 * z * sh[..., 2]
                  - C1 * x * sh[..., 3])
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + C2[0] * xy * sh[..., 4]
                      + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7]
                      + C2[4] * (xx - yy) * sh[..., 8])
            if deg >= 3:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
                if deg >= 4:
                    # degree-4 band (reference eval_sh deg 4,
                    # spherical_harmonics.py:106-125)
                    result = (result
                              + C4[0] * xy * (xx - yy) * sh[..., 16]
                              + C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                              + C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                              + C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                              + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                              + C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                              + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                              + C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                              + C4[8] * (xx * (xx - 3 * yy)
                                         - yy * (3 * xx - yy)) * sh[..., 24])
    return result


def eval_sh_masked(max_deg: int, active_deg: jnp.ndarray, sh: jnp.ndarray,
                   dirs: jnp.ndarray) -> jnp.ndarray:
    """eval_sh where the active degree is a traced scalar.

    Evaluates all bands up to the static max_deg but zero-masks bands above
    active_deg, so the SH-degree ramp (reference oneupSHdegree,
    hugs/models/scene.py:162-164) needs no recompilation.
    """
    n = (max_deg + 1) ** 2
    band = jnp.sqrt(jnp.arange(n, dtype=jnp.float32)).astype(jnp.int32)
    mask = (band <= active_deg).astype(sh.dtype)
    return eval_sh(max_deg, sh * mask, dirs)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (reference RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC SH coefficient -> RGB (reference SH2RGB)."""
    return sh * C0 + 0.5


def sh_basis_rows(max_deg: int, x, y, z):
    """SH basis values as a list of (deg+1)^2 arrays shaped like x.

    Row-major variant for TPU: callers keep the batch axis in LANES
    ((N,) rows) instead of evaluating over (N, K, C) tensors whose
    3-wide channel axis pads to 128 lanes (a ~40x VPU-width waste
    measured on chip). Same constants/order as eval_sh.
    """
    basis = [jnp.full_like(x, C0)]
    if max_deg >= 1:
        basis += [-C1 * y, C1 * z, -C1 * x]
    if max_deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                  C2[3] * xz, C2[4] * (xx - yy)]
    if max_deg >= 3:
        basis += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                  C3[2] * y * (4 * zz - xx - yy),
                  C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                  C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                  C3[6] * x * (xx - 3 * yy)]
    if max_deg >= 4:
        basis += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                  C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                  C4[4] * (zz * (35 * zz - 30) + 3),
                  C4[5] * xz * (7 * zz - 3),
                  C4[6] * (xx - yy) * (7 * zz - 1),
                  C4[7] * xz * (xx - 3 * yy),
                  C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return basis


def eval_sh_rows(max_deg: int, active_deg, sh_rows: jnp.ndarray,
                 x, y, z) -> jnp.ndarray:
    """Row-major masked SH evaluation.

    sh_rows: (K*C, N) with row k*C + c = coefficient k of channel c
    (i.e. shs (N, K, C).reshape(N, K*C).T). x/y/z: (N,) unit direction
    rows. Returns (C, N) channel rows. Bands above the traced
    active_deg are zero-masked (same semantics as eval_sh_masked).
    """
    basis = sh_basis_rows(max_deg, x, y, z)
    band = 0
    out = None
    for k, b in enumerate(basis):
        deg_k = int(k ** 0.5)
        if deg_k > 0:
            b = b * (jnp.asarray(active_deg) >= deg_k).astype(b.dtype)
        term = b[None, :] * sh_rows[3 * k:3 * k + 3]
        out = term if out is None else out + term
        band = deg_k
    del band
    return out
