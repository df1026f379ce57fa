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


def stem_downsample_blocked_reflect(x, k7, b7, k3, b3, eps: float = 1e-5,
                                    outer: int = 0):
    """``stem_downsample_blocked(reflect_pad2d(reflect_pad2d(x, outer), 3),
    …)`` without ever materialising either padded tensor.

    The explicit reflect pads of the big 3-channel stem input are the two
    remaining big pads in the serving forward: the stem's own pad-3 is
    ~11 ms of the 124 ms 532² b32 forward (the zero-trunk → zero-all gap
    in benchmarks/padfold_ab.py — the zero-pad variant is free because
    XLA folds a zero Pad into the conv's window padding), and the task's
    edge-artifact pad-10 (reference ``model/pix2pix.py:91-93``) is the
    same relayout again, unmeasured by padfold_ab because it sits above
    the generator.  Here the blocked stem conv runs with implicit zero
    padding P = outer + 3 (full speed) and the ``nt = ceil(P/2)``-grid-row
    border strips are recomputed exactly from slim bands gathered through
    the COMPOSED reflect index maps (``ops.pad.composed_reflect_idx`` —
    reflect∘reflect ≠ one deeper reflect, so the composition is applied
    index-wise, never as a tensor).

    Reference pattern: ``model/networks.py:341-345`` (ReflectionPad2d(3) →
    Conv2d(7×7) → norm → ReLU) + ``:351-358`` (stride-2 downsample conv),
    under the task-level reflect-pad (``model/pix2pix.py:91-108``).
    """
    from nirgan_tpu.ops.blocked_stem import (
        _blocked_down_kernel,
        instance_norm_blocked,
        stem_downsample_blocked,
    )
    from nirgan_tpu.ops.pad import composed_reflect_idx

    f, kh = 2, k7.shape[0]
    p_in = (kh - 1) // 2
    pads = (outer, p_in)
    P = outer + p_in
    b, h, w, _ = x.shape
    assert (h + 2 * outer) % f == 0 and (w + 2 * outer) % f == 0, (h, w, outer)
    nt = -(-P // f)
    band = f * (nt - 1) + kh + f - 1  # padded rows feeding the edge strips
    if h + 2 * P < 2 * band or w + 2 * P < 2 * band or P >= min(h, w):
        return stem_downsample_blocked(
            reflect_pad2d(reflect_pad2d(x, outer), p_in), k7, b7, k3, b3,
            eps=eps)

    dt = x.dtype
    w_str = _strided_blocked_kernel(k7.astype(dt), f)
    hb = lax.conv_general_dilated(
        x, w_str, (f, f), ((P, P), (P, P)), dimension_numbers=_DIMSPEC)

    # exact border strips from slim composed-reflect bands (gathers touch
    # ≤ band rows/cols of the raw input; the strided conv emits blocked
    # grid rows directly, corners included)
    idx_h = jnp.asarray(composed_reflect_idx(h, pads))
    idx_w = jnp.asarray(composed_reflect_idx(w, pads))

    def _strip(rows_idx, cols_idx):
        s = jnp.take(jnp.take(x, rows_idx, axis=1), cols_idx, axis=2)
        return lax.conv_general_dilated(
            s, w_str, (f, f), ((0, 0), (0, 0)), dimension_numbers=_DIMSPEC)

    hb = hb.at[:, :nt].set(_strip(idx_h[:band], idx_w))
    hb = hb.at[:, -nt:].set(_strip(idx_h[-band:], idx_w))
    hb = hb.at[:, :, :nt].set(_strip(idx_h, idx_w[:band]))
    hb = hb.at[:, :, -nt:].set(_strip(idx_h, idx_w[-band:]))
    if b7 is not None:
        hb = hb + jnp.tile(b7, f * f).astype(hb.dtype)
    hb = instance_norm_blocked(hb, eps)
    hb = jnp.maximum(hb, 0)
    y = lax.conv_general_dilated(
        hb, _blocked_down_kernel(k3.astype(dt)),
        window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=_DIMSPEC,
    )
    if b3 is not None:
        y = y + b3.astype(y.dtype)
    return y


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
