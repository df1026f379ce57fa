"""Convolution primitives (NHWC, torch-parity).

The reference's conv stack is ``nn.Conv2d`` / ``nn.ConvTranspose2d``
(``model/networks.py:341-368``).  Here both lower to a single
``lax.conv_general_dilated`` call in NHWC/HWIO so XLA tiles them onto the
MXU; transposed convolution is expressed as an input-dilated convolution
with a spatially flipped kernel, which is mathematically identical to
torch's ConvTranspose2d (including ``output_padding`` handling).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, bias=None, stride: int = 1, padding: int = 0):
    """2-D convolution, torch ``nn.Conv2d`` semantics.

    Args:
        x: (B, H, W, Cin)
        kernel: (kh, kw, Cin, Cout)  [torch OIHW → transpose(2,3,1,0)]
        bias: optional (Cout,)
        stride: symmetric spatial stride
        padding: symmetric zero padding (torch ``padding=`` int)
    """
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMSPEC,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(
    x,
    kernel,
    bias=None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
):
    """Measured choice: the input-dilated form wins on TPU.  A zero-waste
    subpixel decomposition (4 parity-class convs + depth-to-space) was 17%
    *slower* end-to-end despite 4× fewer MACs — the tiny-kernel convs and the
    interleave reshuffle tile worse than XLA's handling of lhs_dilation
    (benchmarks/RESULTS.md)."""
    return _conv_transpose2d_dilated(x, kernel, bias, stride, padding, output_padding)


def _conv_transpose2d_dilated(
    x,
    kernel,
    bias=None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
):
    """2-D transposed convolution, torch ``nn.ConvTranspose2d`` semantics.

    torch stores ConvTranspose2d weight as (Cin, Cout, kh, kw); we store it
    as (kh, kw, Cin, Cout) [transpose(2,3,0,1)].  The op is realised as a
    stride-1 convolution over the input dilated by ``stride`` with the kernel
    flipped in both spatial dims, padded by (k-1-p) low and (k-1-p+op) high —
    which reproduces torch's output size
    ``(H-1)*s - 2p + k + op`` exactly (reference uses k=3, s=2, p=1, op=1 at
    ``model/networks.py:360-363`` → exact 2× upsampling).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
    pad_lo_h, pad_hi_h = kh - 1 - padding, kh - 1 - padding + output_padding
    pad_lo_w, pad_hi_w = kw - 1 - padding, kw - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((pad_lo_h, pad_hi_h), (pad_lo_w, pad_hi_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMSPEC,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
