"""Train/val metric suite (reference ``utils/calculate_metrics.py:6-37``):
L1, L2, PSNR (max=1.0), SSIM (Gaussian window 5).

Unlike the reference — which clones tensors to host CPU every 10th batch
(``model/pix2pix.py:183-186``) — this computes on device inside the compiled
step; only the four scalars ever cross to the host.
"""

from __future__ import annotations

import jax.numpy as jnp

from nirgan_tpu.losses.pixel import l1_loss, mse_loss, psnr, ssim


def calculate_metrics(pred, target, phase: str = "train", mask=None):
    """Metric dict over the batch.  ``mask`` (B,) marks valid rows when the
    batch was padded up to mesh divisibility (``parallel.mesh.pad_batch``);
    padded rows drop out of every mean.  With equal-size images, the
    row-weighted means equal the reference's whole-tensor means."""
    if mask is None:
        return {
            f"{phase}/L1": l1_loss(pred, target),
            f"{phase}/L2": mse_loss(pred, target),
            f"{phase}/PSNR": psnr(pred, target, 1.0),
            f"{phase}/SSIM": ssim(pred, target, window_size=5, max_val=1.0).mean(),
        }
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)

    def wmean(per_sample):
        return jnp.sum(per_sample * w) / wsum

    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    red = tuple(range(1, d.ndim))
    l2 = wmean(jnp.mean(jnp.square(d), axis=red))
    return {
        f"{phase}/L1": wmean(jnp.mean(jnp.abs(d), axis=red)),
        f"{phase}/L2": l2,
        f"{phase}/PSNR": 10.0 * jnp.log10(1.0 / l2),
        f"{phase}/SSIM": wmean(jnp.mean(
            ssim(pred, target, window_size=5, max_val=1.0), axis=red)),
    }
