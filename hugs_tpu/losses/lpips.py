"""LPIPS perceptual distance in JAX (VGG16 / AlexNet feature backbones).

TPU-native replacement for the `lpips` pip package the reference uses for
both the training loss (hugs/losses/loss.py:39, net='vgg') and eval metric
(hugs/trainer/gs_trainer.py:81, net='alex'). Architecture follows the
published LPIPS design (Zhang et al. 2018): ImageNet-normalized input,
backbone conv features at 5 taps, unit-normalize each feature map, squared
difference, 1x1 linear head per tap, spatial average, sum over taps.

Pretrained weights: this environment has no network and ships no
torch/torchvision checkpoints, so `LPIPS.create` loads weights from an
.npz if one exists at `weights_path` (convertible from the torch lpips
package's state dict via scripts/convert_lpips.py on a machine that has
it), and otherwise falls back to fixed-seed He-initialized features with
uniform linear heads. Random deep conv features still yield a structured
multi-scale perceptual distance (random-feature perceptual metrics are a
known-reasonable fallback), but reported "lpips" numbers are only
comparable to the reference when real weights are supplied.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config up to conv5_3: (out_channels, n_convs) per block
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS(NamedTuple):
    conv_weights: list   # per conv: (kh, kw, cin, cout)
    conv_biases: list    # per conv: (cout,)
    lin_weights: list    # per tap: (c_tap,)
    block_lens: tuple    # convs per block
    has_pretrained: bool

    @staticmethod
    def create(weights_path: str | None = None, seed: int = 0) -> "LPIPS":
        if weights_path and os.path.exists(weights_path):
            z = np.load(weights_path)
            conv_w = [jnp.asarray(z[f"conv_{i}_w"]) for i in range(13)]
            conv_b = [jnp.asarray(z[f"conv_{i}_b"]) for i in range(13)]
            lin_w = [jnp.asarray(z[f"lin_{i}"]) for i in range(5)]
            return LPIPS(conv_w, conv_b, lin_w,
                         tuple(n for _, n in _VGG_BLOCKS), True)
        key = jax.random.PRNGKey(seed)
        conv_w, conv_b, lin_w = [], [], []
        cin = 3
        for cout, n in _VGG_BLOCKS:
            for _ in range(n):
                key, k1 = jax.random.split(key)
                std = float(np.sqrt(2.0 / (3 * 3 * cin)))
                conv_w.append(jax.random.normal(k1, (3, 3, cin, cout)) * std)
                conv_b.append(jnp.zeros(cout))
                cin = cout
            lin_w.append(jnp.full((cout,), 1.0 / cout))
        return LPIPS(conv_w, conv_b, lin_w,
                     tuple(n for _, n in _VGG_BLOCKS), False)

    def features(self, img: jnp.ndarray) -> list:
        """img: (N, 3, H, W) in [0, 1] (LPIPS convention rescales to
        [-1, 1] then ImageNet-normalizes). Returns 5 tap features NCHW."""
        x = img * 2.0 - 1.0
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
            / jnp.asarray(_SCALE)[None, :, None, None]
        taps = []
        ci = 0
        for b, (cout, n) in enumerate(_VGG_BLOCKS):
            if b > 0:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
            for _ in range(n):
                w, bia = self.conv_weights[ci], self.conv_biases[ci]
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "HWIO", "NCHW"))
                x = jax.nn.relu(x + bia[None, :, None, None])
                ci += 1
            taps.append(x)
        return taps

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        """(N, 3, H, W) x2 -> (N,) LPIPS distances."""
        if img1.ndim == 3:
            img1, img2 = img1[None], img2[None]
        f1, f2 = self.features(img1), self.features(img2)
        total = 0.0
        for t, (a, b) in enumerate(zip(f1, f2)):
            na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
            nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2                       # (N, C, H, W)
            w = self.lin_weights[t][None, :, None, None]
            total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
        return total

    def _masked_features(self, img, h, w):
        """Backbone features of the (h, w)-crop sitting at the ORIGIN of
        a static (H, W) canvas, EXACTLY as if the network ran on the
        dynamic (h, w) array alone: after every conv the canvas beyond
        the crop's current extent is re-zeroed (a conv bias makes the
        zero region nonzero, which would leak back across the crop edge
        at the next conv — the reference's 'same' padding contributes
        true zeros there), and the extent follows VALID stride-2
        pooling (h -> floor(h/2)). Returns [(tap, h_t, w_t), ...]."""
        x = img * 2.0 - 1.0
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
            / jnp.asarray(_SCALE)[None, :, None, None]
        h = jnp.asarray(h, jnp.int32)
        w = jnp.asarray(w, jnp.int32)
        taps = []
        ci = 0
        for b, (cout, n) in enumerate(_VGG_BLOCKS):
            if b > 0:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
                h, w = h // 2, w // 2
            rows = jnp.arange(x.shape[2])[None, None, :, None] < h
            cols = jnp.arange(x.shape[3])[None, None, None, :] < w
            valid = rows & cols
            # an odd-extent pool writes max(crop_row, 0) into the row
            # just past the new extent — zero it before the convs read
            # it (the reference's crop simply has no such row)
            x = jnp.where(valid, x, 0.0)
            for _ in range(n):
                wgt, bia = self.conv_weights[ci], self.conv_biases[ci]
                x = jax.lax.conv_general_dilated(
                    x, wgt, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "HWIO", "NCHW"))
                x = jnp.where(valid,
                              jax.nn.relu(x + bia[None, :, None, None]),
                              0.0)
                ci += 1
            taps.append((x, h, w))
        return taps

    def crop_call(self, img1, img2, h, w) -> jnp.ndarray:
        """EXACT LPIPS of the dynamic (h, w)-crops at the origin of
        static (N, 3, H, W) canvases — equals __call__ on the cropped
        arrays, with one XLA compile per CANVAS shape instead of one
        per bbox (the reference crops dynamically,
        gs_trainer.py:513-521; a fresh compile per val frame here).
        Spatial means run over each tap's valid extent only."""
        if img1.ndim == 3:
            img1, img2 = img1[None], img2[None]
        f1 = self._masked_features(img1, h, w)
        f2 = self._masked_features(img2, h, w)
        total = 0.0
        for t, ((a, ht, wt), (b, _, _)) in enumerate(zip(f1, f2)):
            na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
            nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
            # invalid positions: both features are exactly 0 -> d = 0,
            # so a plain sum / (ht*wt) is the crop's spatial mean
            d = (na - nb) ** 2
            wgt = self.lin_weights[t][None, :, None, None]
            s = jnp.sum(jnp.sum(d * wgt, axis=1), axis=(1, 2))
            total = total + s / jnp.maximum(
                (ht * wt).astype(jnp.float32), 1.0)
        return total
