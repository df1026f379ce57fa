"""Pixel-space losses and image-quality terms (NHWC).

Replicates the reference's kornia-based terms without kornia:
  * SSIM with a Gaussian window (σ=1.5), reflect-padded 'same' filtering —
    the exact algorithm behind ``kornia.metrics.ssim`` used at
    ``utils/losses.py:27`` (window 11) and ``utils/calculate_metrics.py:28``
    (window 5).
  * PSNR as ``kornia.metrics.psnr`` (``utils/calculate_metrics.py:25``).
  * Softmax-CDF EMD "histogram" loss (``utils/losses.py:64-78``).

TPU notes: the separable Gaussian blur is expressed as two depthwise
1-D convolutions; everything reduces in f32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["l1_loss", "mse_loss", "ssim", "ssim_loss", "emd_loss", "psnr"]


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64) - (window_size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_blur(x, window_size: int, sigma: float = 1.5):
    """Depthwise separable Gaussian filter, reflect-padded 'same' (the
    kornia ``filter2d`` default border)."""
    b, h, w, c = x.shape
    k = jnp.asarray(_gaussian_kernel1d(window_size, sigma))
    pad = window_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kh = jnp.tile(k.reshape(window_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, window_size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(xp, kh, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c)
    y = lax.conv_general_dilated(y, kw, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c)
    return y


def ssim(img1, img2, window_size: int = 11, max_val: float = 1.0,
         eps: float = 1e-12):
    """Per-pixel SSIM map (same spatial size as inputs).

    Exact algorithm of ``kornia.metrics.ssim`` at the reference's pinned
    kornia==0.7.3 (``requirements.txt:`` pin; used at ``utils/losses.py:27``
    window 11 and ``utils/calculate_metrics.py:28`` window 5): Gaussian
    window σ=1.5 centred on (ws−1)/2, reflect-padded 'same' filtering,
    E[x²]−E[x]² variances, and kornia's ``num / (den + eps)`` guard with
    eps=1e-12.  Verified against a literal torch transcription of the
    kornia source in ``tests/test_losses.py``."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_x = _gaussian_blur(x, window_size)
    mu_y = _gaussian_blur(y, window_size)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _gaussian_blur(x * x, window_size) - mu_xx
    sigma_y = _gaussian_blur(y * y, window_size) - mu_yy
    sigma_xy = _gaussian_blur(x * y, window_size) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return num / (den + eps)


def ssim_loss(img1, img2, window_size: int = 11):
    """1 - mean SSIM (reference ``utils/losses.py:10-29``)."""
    return 1.0 - jnp.mean(ssim(img1, img2, window_size))


def psnr(pred, target, max_val: float = 1.0):
    m = mse_loss(pred, target)
    return 10.0 * jnp.log10((max_val ** 2) / m)


def emd_loss(pred, target):
    """Softmax-CDF earth-mover's proxy (reference ``utils/losses.py:64-78``).

    Per sample: flatten → softmax → cumulative sum → mean |ΔCDF|.  The
    reference's NaN/Inf asserts become debug-mode checks in the train loop
    (``jax_debug_nans``); an assert inside jit would not trace.
    """
    p = pred.astype(jnp.float32).reshape(pred.shape[0], -1)
    t = target.astype(jnp.float32).reshape(target.shape[0], -1)
    p_cdf = jnp.cumsum(_softmax(p), axis=1)
    t_cdf = jnp.cumsum(_softmax(t), axis=1)
    return jnp.mean(jnp.abs(p_cdf - t_cdf))


def _softmax(x):
    x = x - jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=1, keepdims=True)
