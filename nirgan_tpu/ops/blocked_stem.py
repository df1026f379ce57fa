"""Space-to-depth ("blocked") stem pipeline for the ResNet generator.

The reference stem (7×7 conv, 3→64, stride 1 at 532², ``model/networks.py:341``)
is channel-starved on the MXU: Cin=3 occupies 3 of 128 contraction lanes and
round-1 profiling measured it at 3.5% of peak (~24 ms of a ~157 ms batch-32
step), with the following stride-2 d0 conv at 15% (~11 ms).

This module reformulates the `stem → instance-norm → relu → d0` prefix in a
2×2 space-to-depth layout:

  * the 7×7 stem conv is run as a SINGLE stride-2 conv with an 8×8
    "shifted-copies" kernel (Cout 64→256) whose output *is* the 2×2
    space-to-depth of the stride-1 output — no layout transform ever runs,
    and the full-resolution 64-channel tensor (the 2.2 GB reshuffle that
    sank round 1's subpixel experiment, benchmarks/RESULTS.md) is never
    materialized;
  * instance-norm statistics are computed exactly in blocked layout (blocking
    is a spatial permutation; per-channel moments are permutation-invariant:
    the four parity groups have equal pixel counts, so the full-res moment is
    the mean of the per-parity moments);
  * the stride-2 d0 conv (3×3, 64→128) consumes the blocked layout directly
    as a stride-1 2×2 conv with Cin=256, emitting the standard unblocked
    (B, H/2, W/2, 128) tensor the rest of the network expects.

The same strided-conv trick runs the 7×7 Cout=1 head conv
(:func:`conv_valid_blocked`).  Everything is `lax.conv_general_dilated` +
tiny constant-foldable kernel rearrangements, so XLA tiles the convs onto
the MXU with far better contraction/output-lane occupancy.  Math is exactly
equivalent to the unblocked ops (same sums, reordered) — unit-tested.

Blocked channel ordering convention (everywhere): parity-major,
``blocked_channel = (qy * 2 + qx) * C + c``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x, f: int):
    """(B, H, W, C) → (B, H/f, W/f, f²C), parity-major channel order."""
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x, f: int):
    """Inverse of :func:`space_to_depth`."""
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, f * h, f * w, c)


def space_to_depth2(x):
    """(B, H, W, C) → (B, H/2, W/2, 4C), parity-major channel order."""
    return space_to_depth(x, 2)


def depth_to_space2(x):
    """Inverse of :func:`space_to_depth2`."""
    return depth_to_space(x, 2)


def _strided_blocked_kernel(k, f: int):
    """Stride-1 kernel (kh,kw,Cin,Cout) → (kh+f−1, kh+f−1, Cin, f²·Cout)
    kernel whose stride-``f`` conv emits the factor-``f`` space-to-depth of
    the stride-1 valid conv output:  W[j,·,c,(p,·,co)] = w[j−p,·,c,co]."""
    return jnp.concatenate(
        [
            jnp.pad(k, ((py, f - 1 - py), (px, f - 1 - px), (0, 0), (0, 0)))
            for py in range(f)
            for px in range(f)
        ],
        axis=-1,
    )


def conv_valid_blocked(x_padded, k, bias=None, factor: int = 4):
    """Stride-1 *valid* conv emitting a space-to-depth output — realised as a
    SINGLE stride-``f`` conv, so no input layout transform ever runs.

    Built for the generator head (7×7, 64→1 @532²): with Cout=1 the MXU runs
    at <1% occupancy in the natural layout (measured 47 ms in-context).  An
    explicit s2d + dense blocked conv gets the conv down to ~6 ms but pays
    ~23 ms for the 1.16 GB layout shuffle; folding the blocking *into the
    conv* — ``out_blk[Y,(p,co)] = Σ_j x[fY+j]·w[j−p]``, i.e. stride ``f``,
    kernel ``kh+f−1``, Cout ``f²·cout`` — measures 16.7 ms end-to-end
    (benchmarks/RESULTS.md round 2).  The interleave back to full resolution
    touches only the f²·Cout-channel grid output (18 MB here, free).

    Args:
        x_padded: (B, Hout+kh−1, Wout+kh−1, Cin); Hout, Wout ≡ 0 (mod f).
    Returns (B, Hout, Wout, Cout), identical to ``conv2d(x_padded, k)``.
    """
    f = factor
    kh = k.shape[0]
    b, hp, wp, _ = x_padded.shape
    hout, wout = hp - kh + 1, wp - kh + 1
    assert hout % f == 0 and wout % f == 0, (hout, wout, f)
    w_str = _strided_blocked_kernel(k.astype(x_padded.dtype), f)
    y = lax.conv_general_dilated(
        x_padded, w_str,
        window_strides=(f, f), padding=((0, 0), (0, 0)),
        dimension_numbers=_DIMSPEC,
    )
    if bias is not None:
        y = y + jnp.tile(bias, f * f).astype(y.dtype)
    return depth_to_space(y, f)


def _blocked_down_kernel(k3):
    """(3,3,Cin,Cout) stride-2/pad-1 kernel → (2,2,4·Cin,Cout) blocked kernel
    consuming parity-major blocked input with conv padding ((1,0),(1,0)).

    out[Y] = Σ_{dy∈[0,3)} full[2Y+dy−1]·w[dy]; 2Y+dy−1 = 2(Y+By)+qy with
    By∈{−1,0} ⇒ tap KY=By+1 carries w[2KY+qy−1] (zero at −1)."""
    cin, cout = k3.shape[2], k3.shape[3]
    kp = jnp.pad(k3, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index dy+1, zero at low edge
    kq = jnp.arange(2)[:, None] * 2 + jnp.arange(2)[None, :]  # (KY, qy) → 2KY+qy
    wb = kp[kq][:, :, kq]  # (KY,qy, KX,qx, Cin, Cout)
    wb = wb.transpose(0, 2, 1, 3, 4, 5)  # (KY,KX, qy,qx,Cin, Cout)
    return wb.reshape(2, 2, 4 * cin, cout)


def instance_norm_blocked(x, eps: float = 1e-5):
    """Instance norm of the *unblocked* tensor, computed in blocked layout.

    x: (B, h, w, 4C) parity-major.  Per-channel moments over the full-res
    spatial extent equal the average of the four equal-count parity-group
    moments; statistics in float32 (matching ``ops.norm.instance_norm``)."""
    b, _, _, c4 = x.shape
    c = c4 // 4
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=(1, 2)).reshape(b, 4, c).mean(axis=1)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2)).reshape(b, 4, c).mean(axis=1)
    var = m2 - jnp.square(m)
    scale = jnp.reciprocal(jnp.sqrt(var + eps))
    mb = jnp.tile(m, (1, 4)).reshape(b, 1, 1, c4).astype(x.dtype)
    sb = jnp.tile(scale, (1, 4)).reshape(b, 1, 1, c4).astype(x.dtype)
    return (x - mb) * sb


def _disc_stem_kernel(k4):
    """(4,4,Cin,Cout) stride-2/pad-1 kernel → (6,6,Cin,4·Cout) stride-4
    kernel emitting the 2×2 space-to-depth of the stride-2 output
    (parity-major): Wb[j,·,c,(p,·,co)] = k4[j−2p,·,c,co], j−2p ∈ [0,4)."""
    return jnp.concatenate(
        [
            jnp.pad(k4, ((2 * py, 2 - 2 * py), (2 * px, 2 - 2 * px),
                         (0, 0), (0, 0)))
            for py in range(2)
            for px in range(2)
        ],
        axis=-1,
    )


def _disc_down_kernel(k4):
    """(4,4,Cin,Cout) stride-2/pad-1 kernel → (3,3,4·Cin,Cout) stride-1
    kernel consuming parity-major blocked input with padding ((1,1),(1,1)).

    out[i] = Σ_{dy∈[0,4)} in_full[2i+dy−1]·w[dy]; 2i+dy−1 = 2(i+By)+qy with
    By∈{−1,0,1} ⇒ tap KY=By+1 carries w[2KY+qy−2] (zero outside [0,4))."""
    cin, cout = k4.shape[2], k4.shape[3]
    kp = jnp.pad(k4, ((1, 1), (1, 1), (0, 0), (0, 0)))  # index dy+1 ∈ [0,6)
    kq = jnp.arange(3)[:, None] * 2 + jnp.arange(2)[None, :]  # (KY,qy) → dy+1
    wb = kp[kq][:, :, kq]  # (KY,qy, KX,qx, Cin, Cout)
    wb = wb.transpose(0, 2, 1, 3, 4, 5)  # (KY,KX, qy,qx,Cin, Cout)
    return wb.reshape(3, 3, 4 * cin, cout)


def disc_stem_blocked(x, k1, b1, k2, b2, slope: float = 0.2):
    """Fused-layout first two PatchGAN layers:
    ``4×4/s2 conv → LeakyReLU → 4×4/s2 conv`` (NLayerDiscriminator,
    reference ``model/networks.py:557-565``), without materialising the
    full-resolution ndf-channel tensor.

    The first conv is channel-starved (Cin 4-5 of 128 contraction lanes —
    the same MXU-underfeeding pathology the generator stem had; D-fwd
    measured at 27.7% of peak, benchmarks/train_ceiling_256.py row C).
    Here it runs as a single stride-4 conv with the shifted-copies 6×6
    kernel whose output IS the 2×2 space-to-depth of the stride-2 output;
    the second conv consumes the blocked layout directly (3×3 stride-1,
    Cin 4·ndf) and emits the standard (B, H/4, W/4, 2·ndf) tensor.
    LeakyReLU is elementwise, hence blocking-invariant.

    Args:
        x: (B, H, W, Cin) raw discriminator input, H ≡ W ≡ 0 (mod 4).
        k1, b1: conv0 (4,4,Cin,ndf) + bias; k2, b2: conv1 (4,4,ndf,2·ndf).
    Returns (B, H/4, W/4, 2·ndf): conv1 output *before* its norm —
    numerically identical (up to reassociation) to the unblocked chain.
    """
    dt = x.dtype
    y1 = lax.conv_general_dilated(
        x, _disc_stem_kernel(k1.astype(dt)),
        window_strides=(4, 4), padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMSPEC,
    )
    if b1 is not None:
        y1 = y1 + jnp.tile(b1, 4).astype(y1.dtype)
    y1 = jnp.where(y1 >= 0, y1, slope * y1)
    y2 = lax.conv_general_dilated(
        y1, _disc_down_kernel(k2.astype(dt)),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMSPEC,
    )
    if b2 is not None:
        y2 = y2 + b2.astype(y2.dtype)
    return y2


def stem_downsample_blocked(x_padded, k7, b7, k3, b3, eps: float = 1e-5):
    """Fused-layout `7×7 stem conv → IN → ReLU → 3×3 stride-2 d0 conv`.

    Args:
        x_padded: (B, H+6, W+6, Cin) stem input after reflect-pad-3 (H, W even).
        k7, b7:   stem kernel (7,7,Cin,ngf) and bias (or None).
        k3, b3:   d0 kernel (3,3,ngf,2·ngf) and bias (or None).

    Returns (B, H/2, W/2, 2·ngf): the d0 conv output *before* its norm —
    numerically identical (up to fp reassociation) to the unblocked chain.
    """
    dt = x_padded.dtype
    # strided-conv form of the blocked stem: stride-2 conv with the
    # shifted-copies 8×8 kernel — no explicit input s2d (measured ~1.2 ms
    # cheaper than s2d + 4×4 blocked conv at 512² b32)
    h = lax.conv_general_dilated(
        x_padded, _strided_blocked_kernel(k7.astype(dt), 2),
        window_strides=(2, 2), padding=((0, 0), (0, 0)),
        dimension_numbers=_DIMSPEC,
    )
    if b7 is not None:
        h = h + jnp.tile(b7, 4).astype(h.dtype)
    h = instance_norm_blocked(h, eps)
    h = jnp.maximum(h, 0)
    y = lax.conv_general_dilated(
        h, _blocked_down_kernel(k3.astype(dt)),
        window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=_DIMSPEC,
    )
    if b3 is not None:
        y = y + b3.astype(y.dtype)
    return y
