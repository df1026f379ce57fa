"""Convolution primitives (NHWC, torch-parity).

The reference's conv stack is ``nn.Conv2d`` / ``nn.ConvTranspose2d``
(``model/networks.py:341-368``).  Here both lower to a single
``lax.conv_general_dilated`` call in NHWC/HWIO so XLA tiles them onto the
MXU; transposed convolution is expressed as an input-dilated convolution
with a spatially flipped kernel, which is mathematically identical to
torch's ConvTranspose2d (including ``output_padding`` handling).
"""

from __future__ import annotations

import jax
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


def _convt_core_k3s2(x, kernel):
    """The reference k3/s2/p1/op1 transposed-conv core (no bias)."""
    flipped = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, flipped, window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DIMSPEC)


@jax.custom_vjp
def _convt_core_k3s2_pallas(x, kernel):
    """Same forward; backward runs the fused Pallas kernel
    (ops/pallas_convt_bwd.py — u1's XLA-derived gradients measured 9.7 ms
    vs 7.1 fused at b32, ISOLATED).  OPT-IN via NIRGAN_PALLAS_CONVT=1 on
    a single TPU device only (GSPMD cannot partition an opaque
    pallas_call) and measured SLOWER in the real fused step — 119.8 →
    126.2 ms — because the opaque call is a fusion/scheduling barrier in
    the middle of the backward graph (RESULTS.md round-4 cont.).  Kept as
    a flagged exemplar; the default XLA derivative is the production
    path."""
    return _convt_core_k3s2(x, kernel)


def _convt_fwd(x, kernel):
    return _convt_core_k3s2(x, kernel), (x, kernel)


def _convt_bwd(res, ct):
    x, kernel = res
    from nirgan_tpu.ops.pallas_convt_bwd import (
        convt_bwd_supported,
        convt_k3s2_bwd,
    )

    if convt_bwd_supported(ct.shape, kernel.shape):
        dx, dw = convt_k3s2_bwd(ct.astype(x.dtype), x, kernel)
        return dx.astype(x.dtype), dw.astype(kernel.dtype)
    _, vjp = jax.vjp(_convt_core_k3s2, x, kernel)
    return vjp(ct)


_convt_core_k3s2_pallas.defvjp(_convt_fwd, _convt_bwd)


def _use_pallas_convt() -> bool:
    import os

    # env check FIRST: jax.default_backend() blocks forever when the axon
    # tunnel is down (CLAUDE.md), so the backend probe must only run when
    # the user explicitly opted in (same ordering as _use_pallas_head)
    return (os.environ.get("NIRGAN_PALLAS_CONVT", "0") == "1"
            and jax.default_backend() == "tpu"
            and jax.device_count() == 1)


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
    if (kh == 3 and kw == 3 and stride == 2 and padding == 1
            and output_padding == 1):
        core = (_convt_core_k3s2_pallas if _use_pallas_convt()
                else _convt_core_k3s2)
        y = core(x, kernel)
    else:
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
