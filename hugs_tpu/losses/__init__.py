from hugs_tpu.losses.basic import (l1_loss, l2_loss, ssim, ssim_masked,
                                   psnr, total_variation_loss)
from hugs_tpu.losses.lpips import LPIPS
from hugs_tpu.losses.loss import HumanSceneLoss
from hugs_tpu.losses.sampler import sample_patches
