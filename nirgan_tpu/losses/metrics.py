"""Train/val metric suite (reference ``utils/calculate_metrics.py:6-37``):
L1, L2, PSNR (max=1.0), SSIM (Gaussian window 5).

Unlike the reference — which clones tensors to host CPU every 10th batch
(``model/pix2pix.py:183-186``) — this computes on device inside the compiled
step; only the four scalars ever cross to the host.
"""

from __future__ import annotations

from nirgan_tpu.losses.pixel import l1_loss, mse_loss, psnr, ssim


def calculate_metrics(pred, target, phase: str = "train"):
    return {
        f"{phase}/L1": l1_loss(pred, target),
        f"{phase}/L2": mse_loss(pred, target),
        f"{phase}/PSNR": psnr(pred, target, 1.0),
        f"{phase}/SSIM": ssim(pred, target, window_size=5, max_val=1.0).mean(),
    }
