"""On-device histogram matching.

The reference matches each predicted NIR tile to the Sentinel-2 NIR
histogram with skimage on the host, one image at a time
(``create_synthetic_dataset.py:34-47``) — a CPU bottleneck in the middle of
the serving loop.  TPU-natively the same transform is a sort problem:

    out[argsort(src)] = sort(ref)

i.e. each source pixel is replaced by the reference value of equal rank
(quantile mapping).  Two XLA sorts + one gather per image, vmapped over the
batch — no host round-trip.  For continuous-valued imagery this equals
skimage's unique-value/CDF interpolation up to tie handling (tied source
pixels receive rank-order values instead of one shared value; measure-zero
for float reflectance data).

If the reference tile has a different pixel count, its sorted values are
resampled to the source's quantile grid first (linear, like skimage's
``np.interp`` over quantiles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["histogram_match"]


def _match_single(src_flat, ref_sorted):
    n = src_flat.shape[0]
    m = ref_sorted.shape[0]
    if m != n:
        # resample sorted reference onto the source quantile grid
        q = jnp.linspace(0.0, m - 1.0, n)
        lo = jnp.floor(q).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, m - 1)
        w = q - lo
        ref_sorted = ref_sorted[lo] * (1.0 - w) + ref_sorted[hi] * w
    order = jnp.argsort(src_flat)
    ranks = jnp.argsort(order)
    return ref_sorted[ranks]


@jax.jit
def histogram_match(image, reference):
    """(B, H, W, 1) source, (B, h, w, 1) reference → source remapped to the
    reference's intensity distribution, per batch element."""
    b = image.shape[0]
    src = image.reshape(b, -1).astype(jnp.float32)
    ref = jnp.sort(reference.reshape(b, -1).astype(jnp.float32), axis=1)
    out = jax.vmap(_match_single)(src, ref)
    return out.reshape(image.shape).astype(image.dtype)
