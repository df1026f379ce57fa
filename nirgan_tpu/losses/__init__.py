from nirgan_tpu.losses.gan import gan_loss, gradient_penalty
from nirgan_tpu.losses.pixel import l1_loss, mse_loss, ssim, ssim_loss, emd_loss, psnr
from nirgan_tpu.losses.rs_indices import RemoteSensingIndices
from nirgan_tpu.losses.metrics import calculate_metrics

__all__ = [
    "gan_loss",
    "gradient_penalty",
    "l1_loss",
    "mse_loss",
    "ssim",
    "ssim_loss",
    "emd_loss",
    "psnr",
    "RemoteSensingIndices",
    "calculate_metrics",
]
