"""Pallas backward kernels for the k3/s2/p1/op1 transposed convolution.

The u1 up-conv (convT 128→64 → 276² at the 256²-train shape) forwards at
~84-103 TF/s, but XLA's derived gradients are the step's one measured
per-op pathology: grad-input is a 3×3/stride-2 conv over the 276²×64
cotangent (19-21 TF/s) and grad-weight a matching contraction (17-18
TF/s) — ~10 ms of the 136 ms fused step (benchmarks/convgrad_probe.py,
trainledger_probe.py).  Every pure-XLA reformulation measured SLOWER
(parity-split 8.1 ms, im2col 17 ms, W-paired conv 5.7 ms vs 4.6 direct —
trainledger_probe) because each one re-reads or re-lays-out the 312 MB
cotangent; the conv emitter itself is the wall (the pallas_head.py
finding at the same shape class).

This kernel instead works on the FREE W-pair view of the zero-row-padded
cotangent — (B, H+2, W, C) reshaped to (B, H+2, W/2, 2C), a no-copy view
because W and C are memory-adjacent in NHWC — and computes, per 6-output-
row grid step:

  dx[i, j, ci] = Σ_{uy∈3} ROW(2i+uy) · K_cat[uy]      one (W/2, 2C)×(2C, 2Ci)
                                                       MXU dot per (i, uy);
                                                       the lo/hi halves are
                                                       the b=0 / b=−1 pair
                                                       taps, combined by one
                                                       zero-inserting row
                                                       shift (the W edge)
  dw[uy, 1+p, ci, co] += zᵀ·ROW(2i+uy)                one (Ci,W/2)×(W/2,2C)
  dw[uy, 0,  ci, co] += shift(z)ᵀ·ROW(2i+uy)[hi]      transposed dots per
                                                       (i, uy), f32 VMEM
                                                       accumulator

Both gradients share one DMA sweep of the cotangent (the HBM-heavy
operand); dw accumulates across the whole grid in a constant-indexed f32
output block.  All shifts are in-VMEM; no sublane gathers anywhere.

GSPMD cannot partition an opaque pallas_call, so the custom VJP is gated
to unsharded single-device use (``convt_bwd_supported``); multi-chip
training falls back to the XLA derivative (dryrun_multichip unaffected).

Reference op: ``model/networks.py:360-363`` (ConvTranspose2d k3 s2 p1 op1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["convt_k3s2_dx", "convt_k3s2_dw", "convt_bwd_supported",
           "pick_rows_per_step"]

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def pick_rows_per_step(hi: int):
    """Output rows per grid step: a divisor of ``hi`` in [4, 16]."""
    for r in (6, 8, 7, 12, 14, 16, 10, 9, 5, 4, 11, 13, 15):
        if hi % r == 0:
            return r
    return None


def convt_bwd_supported(ct_shape, w_shape) -> bool:
    b, ho, wo, co = ct_shape
    kh, kw, ci, co_w = w_shape
    return (kh == 3 and kw == 3 and co == co_w
            and ho % 2 == 0 and wo % 2 == 0
            and (2 * co) % 128 == 0 and ci % 128 == 0
            and pick_rows_per_step(ho // 2) is not None)


def _build_kcat(w):
    """(3,3,Ci,Co) u1 kernel → (3, 2Co, 2Ci) dot matrices.

    dx[i,j,ci] = Σ_{uy,ux} ct[2i+uy−1, 2j+ux−1, co] · w[uy,ux,ci,co].
    In the W-pair view (pair channel = p·Co + co), the ux taps split into
    the same-pair taps (ux=1 → p0, ux=2 → p1: K_lo) and the previous-pair
    tap (ux=0 ← p1 of pair j−1: K_hi, applied after a +1 row shift of the
    dot result).  K[uy, p·Co+co, ci] = w[uy, ux(p), ci, co]."""
    kh, kw, ci, co = w.shape
    k_lo = jnp.concatenate(
        [jnp.transpose(w[:, 1], (0, 2, 1)),       # (3, Co, Ci) ← ux=1 (p0)
         jnp.transpose(w[:, 2], (0, 2, 1))], 1)   # ux=2 (p1)
    k_hi = jnp.concatenate(
        [jnp.zeros((kh, co, ci), w.dtype),
         jnp.transpose(w[:, 0], (0, 2, 1))], 1)   # ux=0 (p1 of pair j−1)
    return jnp.concatenate([k_lo, k_hi], 2)       # (3, 2Co, 2Ci)


def _dx_kernel(cth, kcat_ref, out_ref, xbuf, sem, *, rows: int, ci: int):
    ib, ii = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        cth.at[ib, pl.ds(ii * 2 * rows, 2 * rows + 1)], xbuf, sem)
    dma.start()
    dma.wait()
    for r in range(rows):
        p = jnp.dot(xbuf[2 * r], kcat_ref[0],
                    preferred_element_type=jnp.float32)
        p = p + jnp.dot(xbuf[2 * r + 1], kcat_ref[1],
                        preferred_element_type=jnp.float32)
        p = p + jnp.dot(xbuf[2 * r + 2], kcat_ref[2],
                        preferred_element_type=jnp.float32)
        lo, hi = p[:, :ci], p[:, ci:]
        shifted = jnp.concatenate(
            [jnp.zeros((1, ci), jnp.float32), hi[:-1]], 0)
        out_ref[0, r] = (lo + shifted).astype(out_ref.dtype)


def convt_k3s2_dx(ct, w):
    """Grad-input of ``conv_transpose2d(x, w, stride=2, padding=1,
    output_padding=1)``: equals the XLA-derived 3×3/s2 conv of the
    cotangent, computed on the free W-pair view."""
    b, ho, wo, co = ct.shape
    ci = w.shape[2]
    hi, wi = ho // 2, wo // 2
    rows = pick_rows_per_step(hi)
    # zero-pad H by (1,1) (cheap axis), W handled by the shift
    cth = jnp.pad(ct, ((0, 0), (1, 1), (0, 0), (0, 0)))
    cth = cth.reshape(b, ho + 2, wi, 2 * co)          # free view
    kcat = _build_kcat(w.astype(ct.dtype))

    kernel = functools.partial(_dx_kernel, rows=rows, ci=ci)
    return pl.pallas_call(
        kernel,
        grid=(b, hi // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 2 * co, 2 * ci), lambda ib, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, wi, ci),
                               lambda ib, ii: (ib, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hi, wi, ci), ct.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * rows + 1, wi, 2 * co), ct.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(cth, kcat)


def _dw_kernel(cth, z_ref, dw_ref, xbuf, sem, *, rows: int, co: int):
    ib, ii = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        cth.at[ib, pl.ds(ii * 2 * rows, 2 * rows + 1)], xbuf, sem)
    dma.start()

    @pl.when(jnp.logical_and(ib == 0, ii == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dma.wait()
    for r in range(rows):
        zr = z_ref[0, r]                               # (Wi, Ci)
        zs = jnp.concatenate(
            [zr[1:], jnp.zeros((1, zr.shape[1]), zr.dtype)], 0)
        for uy in range(3):
            a = xbuf[2 * r + uy]                       # (Wi, 2Co)
            d1 = jax.lax.dot_general(                  # (Ci, 2Co): ux=1,2
                zr, a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d0 = jax.lax.dot_general(                  # (Ci, Co): ux=0
                zs, a[:, co:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_ref[uy, :, :2 * co] += d1
            dw_ref[uy, :, 2 * co:] += d0


def convt_k3s2_dw(ct, z):
    """Grad-weight of the same convT: (3,3,Ci,Co), f32-accumulated."""
    b, ho, wo, co = ct.shape
    ci = z.shape[3]
    hi, wi = ho // 2, wo // 2
    rows = pick_rows_per_step(hi)
    cth = jnp.pad(ct, ((0, 0), (1, 1), (0, 0), (0, 0)))
    cth = cth.reshape(b, ho + 2, wi, 2 * co)

    kernel = functools.partial(_dw_kernel, rows=rows, co=co)
    acc = pl.pallas_call(
        kernel,
        grid=(b, hi // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, rows, wi, ci), lambda ib, ii: (ib, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, ci, 3 * co), lambda ib, ii: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, ci, 3 * co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * rows + 1, wi, 2 * co), ct.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(cth, z)

    # acc[uy, ci, p·Co+co] = dw[uy, 1+p]; acc[uy, ci, 2Co+co] = dw[uy, 0]
    dw = jnp.stack([acc[:, :, 2 * co:],            # ux = 0
                    acc[:, :, :co],                # ux = 1
                    acc[:, :, co:2 * co]], 1)      # ux = 2
    return dw                                       # (3, 3, Ci, Co) f32
