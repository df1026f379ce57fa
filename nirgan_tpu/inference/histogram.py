"""On-device histogram matching, exact to ``skimage.exposure.match_histograms``.

The reference matches each predicted NIR tile to the Sentinel-2 NIR
histogram with skimage on the host, one image at a time
(``create_synthetic_dataset.py:34-47``) — a CPU bottleneck in the middle of
the serving loop.  TPU-natively the same transform runs inside the jitted
serving program with fixed shapes (two sorts + two vectorised binary
searches per image, vmapped over the batch — no host round-trip, no
dynamic-size ``np.unique``).

skimage's float path (``_match_cumulative_cdf``) assigns every source pixel
the template value interpolated at its *group-cumulative* quantile:

    src_q[p]  = (# source pixels <= src[p]) / n          (ties share one q)
    nodes     = {(cum_count(v)/m, v) : v unique template value}
    out[p]    = np.interp(src_q[p], node_q, node_v)

Both pieces have fixed-shape equivalents on the full sorted arrays:
``src_q`` is a right-rank ``searchsorted``; the interp nodes are the
positions where a template value-group ends, located per query with a
``searchsorted`` over the group-quantile step array.  Tied source pixels
therefore receive one shared value and tied template values collapse to one
node, exactly as in skimage — verified against a literal transcription
oracle in ``tests/test_inference.py`` (max |Δ| ≈ f32 rounding, incl. heavily
quantised DN data and different-size references).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["histogram_match"]


def _match_single(src_flat, ref_sorted):
    n = src_flat.shape[0]
    m = ref_sorted.shape[0]
    # per-pixel group-cumulative source quantile (skimage: cumsum(counts)/n
    # evaluated at each pixel's unique value)
    src_sorted = jnp.sort(src_flat)
    q = jnp.searchsorted(src_sorted, src_flat, side="right").astype(
        jnp.float32) * (1.0 / n)
    # template group quantiles: constant within a value-group, the group's
    # cumulative count at every member position
    qt = jnp.searchsorted(ref_sorted, ref_sorted, side="right").astype(
        jnp.float32) * (1.0 / m)
    # upper interp node: first position whose group quantile >= q is the
    # start of the bracketing group; its value IS the node value and i-1 is
    # the last member of the previous group = the lower node
    i = jnp.clip(jnp.searchsorted(qt, q, side="left"), 0, m - 1)
    i0 = jnp.maximum(i - 1, 0)
    q0, v0 = qt[i0], ref_sorted[i0]
    q1, v1 = qt[i], ref_sorted[i]
    w = jnp.where(q1 > q0, (q - q0) / jnp.where(q1 > q0, q1 - q0, 1.0), 1.0)
    out = v0 + w * (v1 - v0)
    # q <= first node quantile → np.interp returns the first template value
    return jnp.where(i == 0, ref_sorted[0], out)


@jax.jit
def histogram_match(image, reference):
    """(B, H, W, 1) source, (B, h, w, 1) reference → source remapped to the
    reference's intensity distribution, per batch element.  Different pixel
    counts need no resampling: the quantile mapping is size-free (skimage
    divides by each array's own size)."""
    b = image.shape[0]
    src = image.reshape(b, -1).astype(jnp.float32)
    ref = jnp.sort(reference.reshape(b, -1).astype(jnp.float32), axis=1)
    out = jax.vmap(_match_single)(src, ref)
    return out.reshape(image.shape).astype(image.dtype)
