"""Mask-biased patch sampling, jittable.

Equivalent of the reference PatchSampler (hugs/utils/sampler.py:11-47):
with probability ratio_mask, sample patch top-left corners whose center
lies inside the (human) mask; otherwise uniformly over the image. The
reference samples without replacement via np.random.choice; here we use
Gumbel-top-k over the masked validity map, which is exact without-
replacement sampling and runs under jit with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_patches(key: jax.Array, mask: jnp.ndarray, images: list,
                   num_patches: int = 4, patch_size: int = 128,
                   ratio_mask: float = 0.9, dilate: int = 0):
    """Sample aligned patches from several (C, H, W) images.

    mask: (H, W) or (1, H, W) float/bool human mask.
    dilate: optional box-dilation (pixels) of the mask before picking
    centers (reference PatchSampler's `dilate`, hugs/utils/sampler.py:
    26-27 — cv2.dilate with a dilate x dilate kernel).
    Returns list of (num_patches, C, patch_size, patch_size) arrays, in
    the same order as `images` (mask patches are not returned; prepend the
    mask to `images` if needed).
    """
    if mask.ndim == 3:
        mask = mask[0]
    H, W = mask.shape
    o = patch_size // 2
    k_mode, k_pick, k_ux, k_uy = jax.random.split(key, 4)

    if dilate > 0:
        lo = dilate // 2
        hi = dilate - 1 - lo
        mask = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, (dilate, dilate), (1, 1),
            [(lo, hi), (lo, hi)])

    # valid centers: mask>0 away from borders (reference crops o:-o)
    valid = (mask > 0)
    border = jnp.zeros_like(valid)
    border = border.at[o:H - o, o:W - o].set(True)
    valid = valid & border

    # Gumbel top-k over valid positions = uniform without replacement
    logits = jnp.where(valid.ravel(), 0.0, -jnp.inf)
    gumbel = jax.random.gumbel(k_pick, (H * W,))
    _, flat_idx = jax.lax.top_k(logits + gumbel, num_patches)
    mx = flat_idx // W
    my = flat_idx % W
    # fall back to uniform if the mask has too few valid pixels
    enough = jnp.sum(valid) >= num_patches

    ux = jax.random.randint(k_ux, (num_patches,), 0, max(H - patch_size, 1))
    uy = jax.random.randint(k_uy, (num_patches,), 0, max(W - patch_size, 1))

    use_mask = (jax.random.uniform(k_mode) < ratio_mask) & enough
    xs = jnp.where(use_mask, jnp.clip(mx - o, 0, H - patch_size), ux)
    ys = jnp.where(use_mask, jnp.clip(my - o, 0, W - patch_size), uy)

    def crop(img):
        def one(x, y):
            return jax.lax.dynamic_slice(
                img, (0, x, y), (img.shape[0], patch_size, patch_size))
        return jax.vmap(one)(xs, ys)

    return [crop(img) for img in images]
