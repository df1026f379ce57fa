"""Per-sample metric computation for the geographic ablation suite.

The reference runs the whole validation dataset at batch size 1 on host
tensors (``spider_validation_callback.py:28-68``).  Here the per-sample
metrics (SSIM-11, PSNR, L1, L2, and the NDVI/NDWI/EVI L1 errors) are one
jitted batched program — per-sample reductions instead of a Python loop —
so the sweep runs at full device batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nirgan_tpu.losses.pixel import ssim
from nirgan_tpu.losses.rs_indices import RemoteSensingIndices

__all__ = ["per_sample_metrics"]

# index mode with the loss-mode epsilon: the reference's per-sample columns
# come from RemoteSensingIndices(mode='loss', criterion='l1') calls
# (spider_validation_callback.py:52-54), i.e. eps=1e-6 inside the indices.
_RS = RemoteSensingIndices(mode="index", eps=1e-6)


def _per_sample_mean(x):
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))


@jax.jit
def per_sample_metrics(rgb, nir, pred):
    """NHWC batches → dict of (B,) per-sample metric vectors."""
    diff = pred.astype(jnp.float32) - nir.astype(jnp.float32)
    l1 = _per_sample_mean(jnp.abs(diff))
    l2 = _per_sample_mean(jnp.square(diff))
    psnr = 10.0 * jnp.log10(1.0 / l2)
    ssim_v = jnp.mean(ssim(nir, pred, window_size=11), axis=(1, 2, 3))

    out = {"l1": l1, "l2": l2, "psnr": psnr, "ssim": ssim_v}
    for name in ("ndvi", "ndwi", "evi"):
        a, b = getattr(_RS, f"{name}_calculation")(rgb, nir, pred)
        out[f"l1_{name}"] = _per_sample_mean(jnp.abs(a - b))
    return out
