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

These kernels instead work on the FREE W-pair view of the zero-row-padded
cotangent — (B, H+2, W, C) reshaped to (B, H+2, W/2, 2C), a no-copy view
because W and C are memory-adjacent in NHWC — and compute, per R-output-
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

The 2R+1 cotangent rows per step arrive via TWO BlockSpec inputs (a 2R-row
block plus a one-row lookahead block) — a manual HBM DMA of a W-extent
that is not 8-aligned (138 pairs) is rejected by Mosaic, and Mosaic's own
pipelining double-buffers BlockSpec operands anyway.  All shifts are
in-VMEM; no sublane gathers anywhere.

GSPMD cannot partition an opaque pallas_call, so the caller must gate the
custom VJP to unsharded single-device use (``convt_bwd_supported``);
multi-chip training falls back to the XLA derivative (dryrun_multichip
unaffected).

Reference op: ``model/networks.py:360-363`` (ConvTranspose2d k3 s2 p1 op1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["convt_k3s2_dx", "convt_k3s2_dw", "convt_bwd_supported",
           "pick_rows_per_step"]


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


def _row(main_ref, next_ref, idx: int, rows: int):
    """Cotangent row ``idx`` ∈ [0, 2·rows]: the last one lives in the
    one-row lookahead block."""
    return main_ref[0, idx] if idx < 2 * rows else next_ref[0, 0]


def _fused_kernel(main_ref, next_ref, z_ref, kflat_ref, dz_ref, dw_ref,
                  acat, *, rows: int, ci: int, co: int):
    """One grid step: build the shared (rows·Wi, 3·2Co) operand A (row r's
    segment holds cotangent rows 2r..2r+2 side by side), then

      dx: ONE (rows·Wi, 3·2Co)×(3·2Co, 2Ci) MXU dot, split lo/hi per row
          segment with a zero-inserting shift (the W edge);
      dw: two transposed dots z̄ᵀ·A into the f32 accumulator.

    A per-(row, uy) K=128 dot variant measured 6.25 ms vs XLA's 4.59 —
    latency-bound; the fat-dot form amortises MXU issue overhead."""
    ib, ii = pl.program_id(0), pl.program_id(1)
    wi = dz_ref.shape[2]
    c2 = 2 * co

    @pl.when(jnp.logical_and(ib == 0, ii == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for r in range(rows):
        for uy in range(3):
            acat[r * wi:(r + 1) * wi, uy * c2:(uy + 1) * c2] = _row(
                main_ref, next_ref, 2 * r + uy, rows)

    # ---- dx -------------------------------------------------------------
    p = jnp.dot(acat[...], kflat_ref[...],
                preferred_element_type=jnp.float32)    # (rows·Wi, 2Ci)
    for r in range(rows):
        seg = p[r * wi:(r + 1) * wi]
        lo, hi = seg[:, :ci], seg[:, ci:]
        shifted = jnp.concatenate(
            [jnp.zeros((1, ci), jnp.float32), hi[:-1]], 0)
        dz_ref[0, r] = (lo + shifted).astype(dz_ref.dtype)

    # ---- dw -------------------------------------------------------------
    z = z_ref[0]                                       # (rows, Wi, Ci)
    zcat = z.reshape(rows * wi, ci)
    zparts = []
    for r in range(rows):
        zr = z[r]
        zparts.append(jnp.concatenate(
            [zr[1:], jnp.zeros((1, ci), zr.dtype)], 0))
    zscat = jnp.concatenate(zparts, 0)                 # z shifted per segment
    d1 = jax.lax.dot_general(zcat, acat[...], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Ci, 3·2Co)
    d0 = jax.lax.dot_general(zscat, acat[...], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    for uy in range(3):
        dw_ref[uy, :, :c2] += d1[:, uy * c2:(uy + 1) * c2]
        dw_ref[uy, :, c2:] += d0[:, uy * c2 + co:(uy + 1) * c2]


def _pair_view(ct):
    """(B, Ho, Wo, Co) → H-zero-padded free W-pair view (B, Ho+2, Wo/2, 2Co)."""
    b, ho, wo, co = ct.shape
    cth = jnp.pad(ct, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return cth.reshape(b, ho + 2, wo // 2, 2 * co)


def convt_k3s2_bwd(ct, z, w):
    """Fused (grad-input, grad-weight) of ``conv_transpose2d(x, w,
    stride=2, padding=1, output_padding=1)`` — one pass over the cotangent
    feeds both gradients through a shared VMEM operand."""
    b, ho, wo, co = ct.shape
    ci = z.shape[3]
    hi, wi = ho // 2, wo // 2
    rows = pick_rows_per_step(hi)
    cth = _pair_view(ct)
    kflat = _build_kcat(w.astype(ct.dtype)).reshape(6 * co, 2 * ci)

    kernel = functools.partial(_fused_kernel, rows=rows, ci=ci, co=co)
    dz, acc = pl.pallas_call(
        kernel,
        grid=(b, hi // rows),
        in_specs=[
            pl.BlockSpec((1, 2 * rows, wi, 2 * co),
                         lambda ib, ii: (ib, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wi, 2 * co),
                         lambda ib, ii, r2=2 * rows: (ib, r2 * ii + r2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wi, ci), lambda ib, ii: (ib, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * co, 2 * ci), lambda ib, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, wi, ci), lambda ib, ii: (ib, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ci, 3 * co), lambda ib, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hi, wi, ci), ct.dtype),
            jax.ShapeDtypeStruct((3, ci, 3 * co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows * wi, 6 * co), ct.dtype),
        ],
    )(cth, cth, z, kflat)

    # acc[uy, ci, p·Co+co] = dw[uy, 1+p]; acc[uy, ci, 2Co+co] = dw[uy, 0]
    dw = jnp.stack([acc[:, :, 2 * co:],            # ux = 0
                    acc[:, :, :co],                # ux = 1
                    acc[:, :, co:2 * co]], 1)      # ux = 2
    return dz, dw                                   # dz bf16-like, dw f32


def convt_k3s2_dx(ct, w):
    """Grad-input only (testing/benchmark convenience)."""
    z = jnp.zeros((ct.shape[0], ct.shape[1] // 2, ct.shape[2] // 2,
                   w.shape[2]), ct.dtype)
    return convt_k3s2_bwd(ct, z, w)[0]


def convt_k3s2_dw(ct, z):
    """Grad-weight only (testing/benchmark convenience)."""
    ci, co = z.shape[3], ct.shape[3]
    w = jnp.zeros((3, 3, ci, co), ct.dtype)
    return convt_k3s2_bwd(ct, z, w)[1]
