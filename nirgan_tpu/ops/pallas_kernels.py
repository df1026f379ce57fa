"""Pallas TPU kernels.

``instance_norm_pallas``: affine-free instance norm over (B, H, W, C) with
one VMEM-resident (H, W, 128-lane) block per grid step.  Statistics are
accumulated f32 over row chunks — the block itself stays bf16/f32 in VMEM
and no full-precision copy is materialised (a naive ``astype(f32)`` of a
133²×128 block blows the 16 MB scoped-VMEM limit; measured).  A custom VJP
implements the standard IN backward

    dx = r · (dy − mean(dy) − y·mean(dy·y)),   r = 1/√(σ² + eps)

with y recomputed in-kernel (no residual tensor).

Status (benchmarks/RESULTS.md): correctness-verified on TPU; **off by
default** (opt in with NIRGAN_PALLAS_IN=1).  The generator's instance-norm
HBM cost concentrates in the 532²/266² stem layers whose blocks cannot fit
VMEM at 128 lanes, so the XLA path with bf16 elementwise math (ops/norm.py)
is the production default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["instance_norm_pallas", "fits_vmem"]

_VMEM_BUDGET = 12 * 1024 * 1024


def _row_chunk(h: int) -> int:
    """Largest divisor of h that is ≤ 32 (static, for the stat loops)."""
    for ch in range(min(32, h), 0, -1):
        if h % ch == 0:
            return ch
    return 1


def _pick_cblock(shape, dtype):
    _, h, w, c = shape
    # in + out blocks are pipeline-double-buffered by pallas ⇒ ×2 each;
    # chunk temporaries are small.
    per_lane = h * w * (4 * jnp.dtype(dtype).itemsize)
    candidates = [cb for cb in (256, 128) if c % cb == 0] or ([c] if c < 128 else [])
    for cb in candidates:
        if per_lane * cb <= _VMEM_BUDGET:
            return cb
    return None


def fits_vmem(shape, dtype) -> bool:
    return _pick_cblock(shape, dtype) is not None


def _moments(x_ref, ch: int, w: int, cb: int):
    """Chunked f32 sum / sum-of-squares over the (1, H, W, CB) block."""
    h = x_ref.shape[1]
    n = h // ch

    def body(i, carry):
        s, ss = carry
        blk = x_ref[0, pl.ds(i * ch, ch)].astype(jnp.float32).reshape(ch * w, cb)
        return (s + jnp.sum(blk, axis=0, keepdims=True),
                ss + jnp.sum(blk * blk, axis=0, keepdims=True))

    zero = jnp.zeros((1, cb), jnp.float32)
    s, ss = lax.fori_loop(0, n, body, (zero, zero))
    cnt = float(h * w)
    mean = s / cnt
    var = ss / cnt - mean * mean
    return mean, var


def _fwd_kernel(x_ref, o_ref, *, eps, ch):
    _, h, w, cb = x_ref.shape
    mean, var = _moments(x_ref, ch, w, cb)
    scale = lax.rsqrt(var + eps)
    m = mean.reshape(1, 1, cb).astype(x_ref.dtype)
    sc = scale.reshape(1, 1, cb).astype(x_ref.dtype)

    def body(i, _):
        blk = x_ref[0, pl.ds(i * ch, ch)]
        o_ref[0, pl.ds(i * ch, ch)] = (blk - m) * sc
        return 0

    lax.fori_loop(0, h // ch, body, 0)


def _bwd_kernel(x_ref, g_ref, o_ref, *, eps, ch):
    _, h, w, cb = x_ref.shape
    mean, var = _moments(x_ref, ch, w, cb)
    r = lax.rsqrt(var + eps)

    # second chunked pass: E[g] and E[g·y]
    def stat_body(i, carry):
        s_g, s_gy = carry
        xb = x_ref[0, pl.ds(i * ch, ch)].astype(jnp.float32).reshape(ch * w, cb)
        gb = g_ref[0, pl.ds(i * ch, ch)].astype(jnp.float32).reshape(ch * w, cb)
        yb = (xb - mean) * r
        return (s_g + jnp.sum(gb, axis=0, keepdims=True),
                s_gy + jnp.sum(gb * yb, axis=0, keepdims=True))

    zero = jnp.zeros((1, cb), jnp.float32)
    s_g, s_gy = lax.fori_loop(0, h // ch, stat_body, (zero, zero))
    cnt = float(h * w)
    g_mean, gy_mean = s_g / cnt, s_gy / cnt

    def body(i, _):
        xb = x_ref[0, pl.ds(i * ch, ch)].astype(jnp.float32)
        gb = g_ref[0, pl.ds(i * ch, ch)].astype(jnp.float32)
        yb = (xb - mean.reshape(1, 1, cb)) * r.reshape(1, 1, cb)
        dx = r.reshape(1, 1, cb) * (gb - g_mean.reshape(1, 1, cb)
                                    - yb * gy_mean.reshape(1, 1, cb))
        o_ref[0, pl.ds(i * ch, ch)] = dx.astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, h // ch, body, 0)


def _call(kernel, out_dtype, x, *rest, eps):
    b, h, w, c = x.shape
    cb = _pick_cblock(x.shape, x.dtype)
    spec = pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, eps=eps, ch=_row_chunk(h)),
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        grid=(b, c // cb),
        in_specs=[spec] * (1 + len(rest)),
        out_specs=spec,
        interpret=jax.default_backend() == "cpu",
    )(x, *rest)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_pallas(x, eps: float = 1e-5):
    return _call(_fwd_kernel, x.dtype, x, eps=eps)


def _fwd(x, eps):
    return instance_norm_pallas(x, eps), x


def _bwd(eps, x, g):
    return (_call(_bwd_kernel, x.dtype, x, g, eps=eps),)


instance_norm_pallas.defvjp(_fwd, _bwd)
