"""Pallas kernel for the generator head conv (7×7, Cin=64 → Cout=1).

STATUS: documented experiment, NOT on the production path — the kernel's MXU
time beats XLA 3× but the surrounding layout boundaries (input pad, output
depth-to-space) cost more than the win: 21.9 ms end-to-end vs 16.5 ms for
the strided-conv head it was meant to replace (full measurement history in
benchmarks/RESULTS.md).  Kept because the formulation is the building block
for a future producer-integrated version (u1 emitting W-blocked layout).

With a single output channel the head fills 1/128 of the MXU's output lanes
no matter how XLA lays it out; the best XLA formulation found (stride-4
"shifted-copies" conv, ops/blocked_stem.py) still measures ~16.5 ms of the
512² batch-32 forward.  This kernel computes the factor-8 space-to-depth
output (Cout = 8·8 = 64 parity channels) as plain MXU dots with **zero
in-kernel layout changes**:

  * At the XLA level the padded input is *freely* reshaped to
    (B, Hp, Wp/8, 512) — the W axis pre-blocked into lanes (row-major
    contiguity makes this a no-copy view).
  * Inside the kernel, the sliding 14-tap im2col window along W is exactly
    **adjacent pairs** of those 512-lane vectors:
    ``X_g = [xs[row, g], xs[row, g+1]]`` covers the 16 columns
    ``8g..8g+15``.  So each output grid row is 14 (row-taps) × 2 (spans)
    MXU dots of (M=2·68, K=512, N=64), accumulated in f32.
  * The blocked kernel ``W[jy, span, (jx,c), (py,px)] = w[jy−py, jx−px, c]``
    (zeros outside [0,7)) is built host-side — 1.8 MB, VMEM-resident.

Output is the (B, G, G, 64) blocked-8 grid; the caller depth-to-spaces the
1-channel result (19 MB — free) and crops.  Backward is a custom VJP that
falls back to the XLA convolution transpose (the head backward is not on
the serving path and trains at the same cost as before).

Reference op: ``model/networks.py:367`` (head conv of ``ResnetGenerator``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["head_conv_pallas", "head_conv_supported"]

F = 8           # space-to-depth factor of the blocked output
R = 4           # output grid rows per kernel step
KH = 7          # head kernel size (reference head is always 7×7)


def head_conv_supported(x_padded_shape, k_shape) -> bool:
    """x_padded: (B, Hout+6, Wout+6, Cin).  The kernel wants the 7×7 head
    with a lane-friendly Cin and a reasonably sized tile."""
    b, hp, wp, cin = x_padded_shape
    kh, kw, _, cout = k_shape
    return (kh == KH and kw == KH and cout == 1 and cin in (32, 64, 128)
            and hp - KH + 1 >= 2 * F and wp - KH + 1 >= 2 * F)


@functools.lru_cache(maxsize=8)
def _wblk_builder(cin: int):
    # index maps for assembling W[jy, span·8+jxq, c, py·8+px] from w[dy,dx,c]
    jy = np.arange(F + KH - 1)
    jx = np.arange(2 * F)
    py = np.arange(F)
    px = np.arange(F)
    dy = jy[:, None] - py[None, :]                      # (JY, F)
    dx = jx[:, None] - px[None, :]                      # (JX, F)
    return dy, dx


def _build_wblk(k, cin: int):
    """(7,7,Cin,1) → (JY=14, 2·8·Cin, 64) blocked kernel (f32→input dtype)."""
    dy, dx = _wblk_builder(cin)
    kp = jnp.pad(k[..., 0], ((0, F + KH), (0, F + KH), (0, 0)))  # index safely
    # W[jy, jx, c, py, px] = w[dy[jy,py], dx[jx,px], c] where valid
    wsel = kp[dy[:, None, :, None] % (KH + F + KH),
              dx[None, :, None, :] % (KH + F + KH)]     # (JY, JX, F, F, C)
    valid = ((dy[:, None, :, None] >= 0) & (dy[:, None, :, None] < KH)
             & (dx[None, :, None, :] >= 0) & (dx[None, :, None, :] < KH))
    wsel = jnp.where(valid[..., None], wsel, 0.0)       # (JY, JX, F, F, C)
    # → (JY, JX·C, F·F): lane order of X is (jx, c); output order (py, px)
    wsel = wsel.transpose(0, 1, 4, 2, 3)                # (JY, JX, C, F, F)
    return wsel.reshape(F + KH - 1, 2 * F * cin, F * F)


def _kernel(xs_hbm, w_ref, out_ref, xbuf, xcat, sem):
    """Grid (B, GH/R).  xs_hbm: full (B, Hq, GW8, F·C) in HBM (window rows
    overlap between steps → manual DMA).  Per output grid row the 14 row-tap
    operands are K-concatenated in VMEM (14 small copies) so the whole row is
    ONE fat MXU dot (M=GW8, K=14·F·C, N=128) — the dot-per-tap variant was
    launch-bound (22 ms).  N packs [lo-span | hi-span]; a single offset-1
    shift-add combines them at the end."""
    ib, iy = pl.program_id(0), pl.program_id(1)
    rows = R * F + KH - 1
    dma = pltpu.make_async_copy(
        xs_hbm.at[ib, pl.ds(iy * (R * F), rows)], xbuf, sem)
    dma.start()
    dma.wait()

    g = out_ref.shape[2]
    fc = xbuf.shape[2]
    taps = F + KH - 1
    for r in range(R):
        for jy in range(taps):
            xcat[:, jy * fc:(jy + 1) * fc] = xbuf[r * F + jy]
        pacc = jnp.dot(xcat[...], w_ref[...],
                       preferred_element_type=jnp.float32)
        combined = pacc[:g, : F * F] + pacc[1 : g + 1, F * F :]
        out_ref[0, r] = combined.astype(out_ref.dtype)

def _forward(x_padded, k):
    b, hp, wp, cin = x_padded.shape
    hout, wout = hp - KH + 1, wp - KH + 1
    gh = -(-hout // F)
    gh += -gh % R                                        # grid rows, mult of R
    gw = -(-(-(-wout // F)) // 8) * 8                    # out grid cols, 8-aligned
    gw8 = gw + 8                                         # xs dim2 (≥ gw+1, 8-aligned)
    assert gw * F >= wout, (gw, wout)
    need_h = gh * F + KH - 1
    need_w = gw8 * F
    xq = jnp.pad(x_padded, ((0, 0), (0, need_h - hp), (0, need_w - wp), (0, 0)))
    xs = xq.reshape(b, need_h, gw8, F * cin)             # free view
    wblk = _build_wblk(k.astype(jnp.float32), cin)       # (JY, 2FC, 64)
    fc = F * cin
    taps = F + KH - 1
    w2 = jnp.concatenate([wblk[:, :fc, :], wblk[:, fc:, :]], axis=-1)
    w2 = w2.reshape(taps * fc, 2 * F * F).astype(x_padded.dtype)

    rows = R * F + KH - 1
    grid = (b, gh // R)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((taps * fc, 2 * F * F),
                         lambda ib, iy: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, gw, F * F),
                               lambda ib, iy: (ib, iy, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gh, gw, F * F), x_padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, gw8, fc), x_padded.dtype),
            pltpu.VMEM((gw8, taps * fc), x_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xs, w2)

    # blocked-8 grid → full resolution, crop the padding back off
    from nirgan_tpu.ops.blocked_stem import depth_to_space

    full = depth_to_space(out, F)
    return full[:, :hout, :wout, :]


@jax.custom_vjp
def head_conv_pallas(x_padded, k):
    """Valid 7×7 conv (Cin → 1): equals ``conv2d(x_padded, k)``."""
    return _forward(x_padded, k)


def _fwd(x_padded, k):
    return _forward(x_padded, k), (x_padded, k)


def _bwd(res, g):
    x_padded, k = res
    dims = ("NHWC", "HWIO", "NHWC")
    # dx: full-correlation of the cotangent with the flipped kernel
    kx = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    dx = lax.conv_general_dilated(g, kx, (1, 1),
                                  ((KH - 1, KH - 1), (KH - 1, KH - 1)),
                                  dimension_numbers=dims).astype(x_padded.dtype)
    # dk[dy,dx,c,o] = Σ_b,y,x x[y+dy, x+dx, c] · g[y,x,o]
    dk = lax.conv_general_dilated(
        x_padded.transpose(3, 1, 2, 0).astype(g.dtype),  # (C, Hp, Wp, B)
        g.transpose(1, 2, 0, 3),                          # (Ho, Wo, B, 1)
        (1, 1), ((0, 0), (0, 0)), dimension_numbers=dims)
    return dx, dk.transpose(1, 2, 0, 3).astype(k.dtype)


head_conv_pallas.defvjp(_fwd, _bwd)
