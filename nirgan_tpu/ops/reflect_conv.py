"""Reflect-pad folded into the convolution (NHWC, stride 1 + blocked head).

``conv2d(reflect_pad2d(x, p), k)`` is the single most expensive *pattern*
in the network: the explicit reflect pad is a W-axis (sublane) relayout of
a large tensor AND a fusion barrier, measured in-context at 34 ms of the
121 ms generator fwd+bwd at 276² b32 (benchmarks/padfold_ab.py) — the
conv itself runs at ~peak.  XLA's convolution handles implicit ZERO
padding for free (it is part of the conv op's halo handling), so here the
pattern is computed as

    y = conv(x, k, padding=p)            # zero-SAME, full speed
    y[border strips] = exact recompute   # tiny reflect-padded slices

The interior is bit-identical to the reference pattern (same conv on the
same values); the p-wide border strips are the same contraction evaluated
in a separate (small) conv call, so they agree up to bf16 reassociation.
Strip inputs are built from ≤3p-row/col slices — the flips/concats touch
tiny tensors only.  Border overwrite is a static-slice ``.at[].set``
(a fusible dynamic-update-slice; no scatter).

The backward inherits the same structure from autodiff: the main conv's
VJP is the at-peak zero-pad conv gradient, the strip VJPs are tiny, and
the reflect-pad transpose of a 300 MB tensor (7.9 ms isolated) never
appears.

Reference pattern: ``model/networks.py:341,406`` (ReflectionPad2d → Conv2d).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from nirgan_tpu.ops.blocked_stem import _strided_blocked_kernel, depth_to_space
from nirgan_tpu.ops.conv import conv2d
from nirgan_tpu.ops.pad import reflect_pad2d

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _reflect_w(t, p: int):
    return jnp.pad(t, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")


def _reflect_h(t, p: int):
    return jnp.pad(t, ((0, 0), (p, p), (0, 0), (0, 0)), mode="reflect")


def conv2d_reflect(x, kernel, bias=None, pad: int = 1):
    """``conv2d(reflect_pad2d(x, pad), kernel, stride=1, padding=0)``.

    Requires a (2p+1)×(2p+1) kernel (the only reflect-padded conv shapes in
    the network: trunk 3×3/p1, stem & head 7×7/p3).  Falls back to the
    explicit-pad path when the spatial extent is too small for disjoint
    border strips.
    """
    p = pad
    kh, kw = kernel.shape[0], kernel.shape[1]
    b, h, w, _ = x.shape
    if p == 0:
        return conv2d(x, kernel, bias)
    if kh != 2 * p + 1 or kw != 2 * p + 1 or h < 4 * p + 1 or w < 4 * p + 1:
        return conv2d(reflect_pad2d(x, p), kernel, bias)

    # main conv: implicit zero padding, full speed, correct in the interior
    y = conv2d(x, kernel, bias, stride=1, padding=p)

    # border strips — P(x) rows/cols [0, 3p) rebuilt from ≤2p-wide slices.
    # Assembly A/B'd three ways IN CONTEXT (benchmarks/padfold_ab.py,
    # foldstrip_ab.py): this 4-strip-conv + 4-DUS form measured best for
    # the fwd+bwd training graph (532² G step: 401.4 ms vs 410.6 for the
    # batched-strips+where variant that won the isolated fwd microbench).
    top_in = _reflect_w(
        jnp.concatenate([jnp.flip(x[:, 1:p + 1], 1), x[:, :2 * p]], 1), p)
    bot_in = _reflect_w(
        jnp.concatenate([x[:, -2 * p:], jnp.flip(x[:, -p - 1:-1], 1)], 1), p)
    left_in = _reflect_h(
        jnp.concatenate([jnp.flip(x[:, :, 1:p + 1], 2), x[:, :, :2 * p]], 2), p)
    right_in = _reflect_h(
        jnp.concatenate([x[:, :, -2 * p:], jnp.flip(x[:, :, -p - 1:-1], 2)], 2), p)

    y = y.at[:, :p].set(conv2d(top_in, kernel, bias))
    y = y.at[:, -p:].set(conv2d(bot_in, kernel, bias))
    y = y.at[:, :, :p].set(conv2d(left_in, kernel, bias))
    y = y.at[:, :, -p:].set(conv2d(right_in, kernel, bias))
    return y


def _blocked_strips(xs, k, f: int, p: int, kh: int):
    """Exact border strips for the blocked strided conv, computed as PLAIN
    (unblocked) valid convs on the reflect-padded border slices, then
    space-to-depth'd — the tensors are tiny, so the channel-starved plain
    conv is cheap, and the s2d touches only ``nt``-block-wide strips.

    xs: raw (unpadded) input; returns (top, bot, left, right) blocked
    strips of ``nt = ceil(p/f)`` grid rows/cols each (bias-free — the
    caller adds the tiled bias after assembly).
    """
    from nirgan_tpu.ops.blocked_stem import space_to_depth

    nt = -(-p // f)
    span = f * nt + kh - 1 - p  # raw rows needed beyond the mirror band

    top = conv2d(_reflect_w(jnp.concatenate(
        [jnp.flip(xs[:, 1:p + 1], 1), xs[:, :span]], 1), p), k)
    bot = conv2d(_reflect_w(jnp.concatenate(
        [xs[:, -span:], jnp.flip(xs[:, -p - 1:-1], 1)], 1), p), k)
    left = conv2d(_reflect_h(jnp.concatenate(
        [jnp.flip(xs[:, :, 1:p + 1], 2), xs[:, :, :span]], 2), p), k)
    right = conv2d(_reflect_h(jnp.concatenate(
        [xs[:, :, -span:], jnp.flip(xs[:, :, -p - 1:-1], 2)], 2), p), k)
    return (nt, space_to_depth(top, f), space_to_depth(bot, f),
            space_to_depth(left, f), space_to_depth(right, f))


def conv_valid_blocked_reflect(x, k, bias=None, factor: int = 4):
    """``conv_valid_blocked(reflect_pad2d(x, p), k, bias, factor)`` for a
    (2p+1)×(2p+1) kernel (the generator head: 7×7, p=3) — the reflect pad
    of the 300 MB head input never materialises.

    x: (B, H, W, Cin) raw head input, H ≡ W ≡ 0 (mod factor).
    Returns (B, H, W, Cout).
    """
    f = factor
    kh = k.shape[0]
    p = (kh - 1) // 2
    b, h, w, _ = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    if h < 2 * (f * (-(-p // f)) + kh - 1 - p) or w < 2 * (f * (-(-p // f)) + kh - 1 - p):
        from nirgan_tpu.ops.blocked_stem import conv_valid_blocked

        return conv_valid_blocked(reflect_pad2d(x, p), k, bias, factor=f)

    dt = x.dtype
    w_str = _strided_blocked_kernel(k.astype(dt), f)

    # main: the same strided-blocked conv with implicit zero padding
    y = lax.conv_general_dilated(
        x, w_str, (f, f), ((p, p), (p, p)), dimension_numbers=_DIMSPEC)

    nt, top, bot, left, right = _blocked_strips(x, k.astype(dt), f, p, kh)
    y = y.at[:, :nt].set(top)
    y = y.at[:, -nt:].set(bot)
    y = y.at[:, :, :nt].set(left)
    y = y.at[:, :, -nt:].set(right)

    if bias is not None:
        y = y + jnp.tile(bias, f * f).astype(y.dtype)
    return depth_to_space(y, f)
