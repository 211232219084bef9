"""Image losses, pure JAX: masked L1, windowed SSIM, PSNR, TV.

Numerics match the reference implementations (hugs/losses/utils.py:54-108,
hugs/utils/image.py:27-29): SSIM uses an 11x11 Gaussian window, sigma 1.5,
same-padding depthwise convolution, C1=0.01^2, C2=0.03^2. Images are
(3, H, W) in [0, 1].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray,
            mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference l1_loss (losses/utils.py:54-58): with a mask, the SUM of
    absolute error over the whole image divided by mask.sum()."""
    if mask is not None:
        return jnp.sum(jnp.abs(pred - gt)) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over flattened pixels (reference image.py:27-29)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@functools.lru_cache(maxsize=4)
def _gaussian_window_np(window_size: int, sigma: float):
    # cache NUMPY only — caching a jnp array created inside a jit trace
    # would leak a tracer into later traces
    import numpy as np
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return g


def _gaussian_window(window_size: int, sigma: float):
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _depthwise_blur(img: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) same-padded depthwise Gaussian blur.

    SEPARABLE: the reference blurs with the 2-D window outer(g, g)
    (hugs/losses/utils.py:62-75); g g^T is rank-1, so two 1-D passes
    (k + k taps) compute the identical result at 5.5x fewer MACs than
    the 121-tap 2-D conv — measured 34.5 -> 11.9 ms per SSIM fwd+bwd
    at 540p on chip, and the joint release step runs SSIM twice (full
    + humansep). fp difference vs the 2-D conv is ~1e-8 (summation
    order only).
    """
    c, k = img.shape[0], g.shape[0]
    # HIGHEST is load-bearing: TPU convs default to bf16, and SSIM's
    # variance terms are cancellations (blur(x^2) - mu^2 ~ 1e-3) that
    # bf16 error swamps relative to C2=9e-4 — observed as SSIM "1.08"
    # and garbage SSIM gradients on hardware (CPU f32 hides it).
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    kh = jnp.tile(g.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kw = jnp.tile(g.reshape(1, 1, 1, k), (c, 1, 1, 1))
    out = conv(img[None], kh, padding=[(k // 2, k // 2), (0, 0)])
    out = conv(out, kw, padding=[(0, 0), (k // 2, k // 2)])
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over the image, (C, H, W) inputs."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, w) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def ssim_masked(img1: jnp.ndarray, img2: jnp.ndarray, valid: jnp.ndarray,
                n_valid: jnp.ndarray, window_size: int = 11,
                sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a rectangular valid region of (C, H, W) inputs.

    Inputs must be ZEROED outside `valid` ((1, H, W) or (C, H, W) bool).
    For a rectangular region this equals plain `ssim` computed on the
    cropped rectangle exactly: windows that cross the region edge see
    zeros here, and the reference's crop-SSIM zero-pads its conv the
    same way (hugs/losses/utils.py:62-75 'same' padding). Lets crop
    metrics run at a STATIC bucketed shape — one XLA compile per bucket
    instead of one per bbox (minutes each through this environment's
    remote-compile relay)."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, w) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.sum(jnp.where(valid, ssim_map, 0.0)) / (
        img1.shape[0] * jnp.maximum(n_valid, 1))


def total_variation_loss(img: jnp.ndarray,
                         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Anisotropic TV (reference losses/utils.py:23-51)."""
    d_x = img[..., :, 1:] - img[..., :, :-1]
    d_y = img[..., 1:, :] - img[..., :-1, :]
    tv = jnp.sum(jnp.abs(d_x)) + jnp.sum(jnp.abs(d_y))
    if mask is not None:
        return tv / jnp.maximum(jnp.sum(mask), 1.0)
    return tv / (img.shape[-1] * img.shape[-2])


def pcd_laplacian_smoothing(verts: jnp.ndarray,
                            edges: jnp.ndarray) -> jnp.ndarray:
    """Uniform-Laplacian smoothing regularizer (reference
    pcd_laplacian_smoothing, losses/utils.py:152-162, via pytorch3d's
    sparse laplacian): mean ||L @ verts|| with L = A/deg - I built from
    the (E, 2) undirected edge list. The Laplacian itself is treated as
    a constant (stop_gradient on the structure is implicit — it only
    depends on connectivity)."""
    n = verts.shape[0]
    deg = jnp.zeros(n).at[edges[:, 0]].add(1.0).at[edges[:, 1]].add(1.0)
    inv_deg = 1.0 / jnp.clip(deg, 1.0)
    nb = jnp.zeros_like(verts)
    nb = nb.at[edges[:, 0]].add(verts[edges[:, 1]])
    nb = nb.at[edges[:, 1]].add(verts[edges[:, 0]])
    lap = nb * inv_deg[:, None] - verts
    return jnp.mean(jnp.linalg.norm(lap, axis=-1))
