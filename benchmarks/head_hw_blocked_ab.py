"""A/B: head conv as an H-strided × W-reshaped blocked conv.

Key layout facts driving this (NHWC row-major):
  * W-blocking is a FREE reshape — (B,H,W,C) → (B,H,W/8,8C) moves no bytes
    because W and C are adjacent in memory (lane = wq·C + c, w-major).
  * H-blocking folds into the conv as a stride with a shifted-copies kernel
    (ops/blocked_stem.py trick) — no input transpose either.
Together the 7×7 64→1 head becomes one stride-(4,1) conv with kernel
(10, 2, 512, 32): Cout = 4(H-parity)·8(W-parity) = 32 lanes, input never
shuffled, and only the tiny (B,134,68,32) output is interleaved back.

Run on TPU: python benchmarks/head_hw_blocked_ab.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nirgan_tpu.ops.blocked_stem import conv_valid_blocked

DIMS = ("NHWC", "HWIO", "NHWC")


def hw_blocked_head_kernel(k7, fh: int, fw: int):
    """(7,7,Cin,1) → (6+fh, 2, fw·Cin, fh·fw) kernel for the stride-(fh,1)
    conv over the W-reshaped input.  Entry [j, b, wq·Cin+c, p·fw+q] =
    k7[j−p, fw·b+wq−q, c, 0] where in range, else 0."""
    kh, kw, cin, cout = k7.shape
    assert cout == 1
    k = np.zeros((kh + fh - 1, 2, fw * cin, fh * fw), np.float32)
    k7 = np.asarray(k7, np.float32)
    for j in range(kh + fh - 1):
        for b in range(2):
            for wq in range(fw):
                for p in range(fh):
                    for q in range(fw):
                        dy, dx = j - p, fw * b + wq - q
                        if 0 <= dy < kh and 0 <= dx < kw:
                            k[j, b, wq * cin:(wq + 1) * cin, p * fw + q] = \
                                k7[dy, dx, :, 0]
    return jnp.asarray(k)


def head_hw_blocked(xp, kblk, fh: int, fw: int, hout: int, wout: int):
    """xp: (B, Hp, Wp, Cin) padded input, Wp ≡ 0 (mod fw).  Returns
    (B, hout, wout, 1) == valid 7×7 conv of xp, cropped."""
    b, hp, wp, cin = xp.shape
    xw = xp.reshape(b, hp, wp // fw, fw * cin)          # free reshape
    y = lax.conv_general_dilated(
        xw, kblk.astype(xp.dtype), window_strides=(fh, 1),
        padding=((0, 0), (0, 0)), dimension_numbers=DIMS)
    bb, gh, gw, _ = y.shape
    y = y.reshape(bb, gh, gw, fh, fw).transpose(0, 1, 3, 2, 4)
    y = y.reshape(bb, gh * fh, gw * fw, 1)
    return y[:, :hout, :wout]


def measure(fn, xs, iters=30, label=""):
    acc = jnp.zeros((), jnp.float32)
    acc = fn(xs[0], acc)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(xs[i % len(xs)], acc)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"{label:46s} {1000*dt/iters:7.2f} ms/batch")


def main():
    rng = np.random.default_rng(0)
    b = 32
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 1)), jnp.float32) * 0.05
    kb = k.astype(jnp.bfloat16)
    bias = jnp.float32(0.01)
    xs = [jnp.asarray(rng.standard_normal((b, 538, 538, 64)), jnp.bfloat16)
          for _ in range(2)]

    def pads(fh, fw):
        pad_h = (-532) % fh                       # out rows to fh multiple
        wp = 538 + ((-max(538, 532 + fw)) % fw) + (0 if 538 >= 532 + fw
                                                   else max(538, 532 + fw) - 538)
        wp = ((max(538, 532 + fw) + fw - 1) // fw) * fw
        return pad_h, wp - 538

    variants = [(4, 8), (8, 8), (4, 16), (2, 8)]
    kernels = {v: hw_blocked_head_kernel(k, *v) for v in variants}

    # correctness vs the production f=4 path (f32 exactness on CPU-ish check)
    y_ref = conv_valid_blocked(xs[0][:1].astype(jnp.float32), k, None, factor=4)
    for (fh, fw) in variants:
        pad_h, pad_w = pads(fh, fw)
        xpf = jnp.pad(xs[0][:1].astype(jnp.float32),
                      ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        yb = head_hw_blocked(xpf, kernels[(fh, fw)], fh, fw, 532, 532)
        err = float(jnp.max(jnp.abs(yb - y_ref)))
        print(f"fh={fh} fw={fw}: max |Δ| vs production = {err:.2e}")

    @jax.jit
    def prod(x, acc):
        y = conv_valid_blocked(x, kb, jnp.asarray([0.01], jnp.bfloat16), factor=4)
        return acc + jnp.sum(y.astype(jnp.float32))

    def make(fh, fw):
        kblk = kernels[(fh, fw)].astype(jnp.bfloat16)

        pad_h, pad_w = pads(fh, fw)

        @jax.jit
        def fn(x, acc):
            xpf = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            y = head_hw_blocked(xpf, kblk, fh, fw, 532, 532) + bias
            return acc + jnp.sum(y.astype(jnp.float32))

        return fn

    measure(prod, xs, label="production strided-4 head")
    for fh, fw in variants:
        measure(make(fh, fw), xs, label=f"H-stride-{fh} x W-reshape-{fw} head")


if __name__ == "__main__":
    main()
