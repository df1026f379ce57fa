"""Probe 2: realistic int8 trunk — 9 chained ResNet blocks with real IN.

Builds on benchmarks/int8_probe.py (chained int8 conv = 1.57x bf16).  The
real trunk block is pad->conv->IN->relu->pad->conv->IN->+residual
(reference model/networks.py:377-434); IN needs per-(b,c) spatial moments,
so each conv becomes two passes:

  P1: reflect-pad(int8) -> conv int8xint8 -> int32 acc -> fused epilogue
      requantises to an int8 intermediate (per-channel scale) and reduces
      f32 moment sums.  IN is invariant to per-channel scale/shift, so the
      intermediate's quantisation scale cancels inside the norm; conv bias
      before affine-free IN is a mathematical no-op and is dropped.
  P2: elementwise: normalise with the P1 moments (f32 stats), ReLU,
      requantise to the next conv's int8 input scale.  For conv2, the P2
      pass also adds the dequantised residual stream and requantises.

Questions answered here:
  A. does the int8 fast conv path survive a bf16 (not int8) epilogue?
  B. what do fused moment reductions cost on top of the chained conv?
  C. end-to-end: 9 int8 blocks vs 9 bf16 blocks (the production path).

Run on the TPU: python benchmarks/int8_block_probe.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, S, C = 32, 133, 256
N = S * S
EPS = 1e-5


def timeit(fn, args, iters=20, label=""):
    # fn must return a SCALAR checksum: the axon tunnel eagerly stages big
    # output buffers, so returning full tensors times the link, not the TPU.
    out = fn(*args)
    np.asarray(out)  # compile + execute barrier (single pull)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:58s} {dt*1e3:8.3f} ms")
    return dt


def rpad(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def conv_valid(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


# ---------------- bf16 reference block (production path today) -------------

def in_bf16(x):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True) - jnp.square(mean)
    scale = jnp.reciprocal(jnp.sqrt(var + EPS))
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def block_bf16(x, w1, w2):
    h = conv_valid(rpad(x), w1, jnp.float32).astype(jnp.bfloat16)
    h = jax.nn.relu(in_bf16(h))
    h = conv_valid(rpad(h), w2, jnp.float32).astype(jnp.bfloat16)
    return x + in_bf16(h)


# ---------------- int8 block ----------------------------------------------

def conv_p1(x8, w8, rq):
    """P1: int8 conv -> int8 intermediate (per-channel scale rq) + f32 moments."""
    acc = conv_valid(rpad(x8), w8, jnp.int32)
    a32 = acc.astype(jnp.float32)
    hi = jnp.clip(jnp.rint(a32 * rq), -127, 127).astype(jnp.int8)
    m1 = jnp.sum(a32, axis=(1, 2))            # (B, C) moment sums of raw acc
    m2 = jnp.sum(jnp.square(a32), axis=(1, 2))
    return hi, m1, m2


def norm_from_moments(hi, rq, m1, m2, eps_adj):
    """(hi/rq - mean)/sqrt(var + eps') computed in quantised units.

    hi stores acc*rq; moments are of raw acc.  IN is invariant to the
    per-channel scale, so normalise raw-acc units: value = hi/rq."""
    mean = (m1 / N)[:, None, None, :]
    var = (m2 / N - jnp.square(m1 / N))[:, None, None, :]
    rstd = lax.rsqrt(var + eps_adj)
    v = hi.astype(jnp.float32) / rq
    return (v - mean) * rstd


def block_int8(x8, w81, w82, rq1, rq2, s_in, s_out, eps1, eps2):
    """x8: residual stream quantised with scale s_in (real = x8 * s_in)."""
    hi1, m1a, m2a = conv_p1(x8, w81, rq1)
    # P2a: IN -> ReLU -> requant to the static post-IN activation scale.
    y = jax.nn.relu(norm_from_moments(hi1, rq1, m1a, m2a, eps1))
    h8 = jnp.clip(jnp.rint(y * (127.0 / 6.0)), -127, 127).astype(jnp.int8)
    hi2, m1b, m2b = conv_p1(h8, w82, rq2)
    # P2b: IN -> + dequantised residual -> requant to next stream scale.
    y2 = norm_from_moments(hi2, rq2, m1b, m2b, eps2)
    out = y2 + x8.astype(jnp.float32) * s_in
    return jnp.clip(jnp.rint(out / s_out), -127, 127).astype(jnp.int8)


# ---------------- int8 conv + bf16 intermediate variant ---------------------
# Avoids the second (acc->int8) quantisation stage entirely: the conv's int32
# acc is stored bf16, moments reduced f32 in the same fusion; the P2 pass
# normalises the bf16 copy with the f32 moments.  2x the intermediate bytes,
# but no rq calibration and one fewer rounding in the math.

def conv_p1_bf16(x8, w8):
    acc = conv_valid(rpad(x8), w8, jnp.int32)
    a32 = acc.astype(jnp.float32)
    m1 = jnp.sum(a32, axis=(1, 2))
    m2 = jnp.sum(jnp.square(a32), axis=(1, 2))
    return a32.astype(jnp.bfloat16), m1, m2


def norm_bf16(hb, m1, m2, eps_adj):
    mean = (m1 / N)[:, None, None, :]
    var = (m2 / N - jnp.square(m1 / N))[:, None, None, :]
    rstd = lax.rsqrt(var + eps_adj)
    return (hb.astype(jnp.float32) - mean) * rstd


def block_int8_bf16i(x8, w81, w82, s_in, s_out, eps1, eps2):
    hb1, m1a, m2a = conv_p1_bf16(x8, w81)
    y = jax.nn.relu(norm_bf16(hb1, m1a, m2a, eps1))
    h8 = jnp.clip(jnp.rint(y * (127.0 / 6.0)), -127, 127).astype(jnp.int8)
    hb2, m1b, m2b = conv_p1_bf16(h8, w82)
    y2 = norm_bf16(hb2, m1b, m2b, eps2)
    out = y2 + x8.astype(jnp.float32) * s_in
    return jnp.clip(jnp.rint(out / s_out), -127, 127).astype(jnp.int8)


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-100, 100, (B, S, S, C), dtype=np.int8))
    xb = (x8.astype(jnp.bfloat16) * 0.05).astype(jnp.bfloat16)
    mk_w8 = lambda: jnp.asarray(rng.integers(-127, 127, (3, 3, C, C), dtype=np.int8))
    w8s = [(mk_w8(), mk_w8()) for _ in range(9)]
    wbs = [(jnp.asarray(rng.normal(0, 0.02, (3, 3, C, C)), jnp.bfloat16),
            jnp.asarray(rng.normal(0, 0.02, (3, 3, C, C)), jnp.bfloat16))
           for _ in range(9)]
    rq = jnp.full((C,), 1e-4, jnp.float32)
    flops1 = 2 * 9 * C * C * S * S * B  # one conv

    # A: epilogue dtype sensitivity of the fast path (scalar-checksummed)
    f_i8 = jax.jit(lambda x, w: jnp.sum(
        jnp.clip(conv_valid(rpad(x), w, jnp.int32).astype(jnp.float32) * 1e-4,
                 -127, 127).astype(jnp.int8).astype(jnp.int32)))
    f_bf = jax.jit(lambda x, w: jnp.sum(
        (conv_valid(rpad(x), w, jnp.int32).astype(jnp.float32) * 1e-4)
        .astype(jnp.bfloat16).astype(jnp.float32)))
    f_f32 = jax.jit(lambda x, w: jnp.sum(
        conv_valid(rpad(x), w, jnp.int32).astype(jnp.float32) * 1e-4))
    dt = timeit(f_i8, (x8, w8s[0][0]), label="A: int8 conv -> int8 out")
    print(f"{'':58s} {flops1/dt/1e12:8.1f} TOP/s")
    dt = timeit(f_bf, (x8, w8s[0][0]), label="A: int8 conv -> bf16 out")
    print(f"{'':58s} {flops1/dt/1e12:8.1f} TOP/s")
    dt = timeit(f_f32, (x8, w8s[0][0]), label="A: int8 conv -> f32 out")
    print(f"{'':58s} {flops1/dt/1e12:8.1f} TOP/s")

    # B: P1 with fused moments
    f_p1 = jax.jit(lambda x, w, r: (lambda o: jnp.sum(o[0].astype(jnp.int32))
                                    + jnp.sum(o[1]) + jnp.sum(o[2]))(conv_p1(x, w, r)))
    dt = timeit(f_p1, (x8, w8s[0][0], rq), label="B: P1 conv+requant+moments")
    print(f"{'':58s} {flops1/dt/1e12:8.1f} TOP/s")

    # C: 9 chained blocks
    @jax.jit
    def trunk_bf16(x, ws):
        for (w1, w2) in ws:
            x = block_bf16(x, w1, w2)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def trunk_int8(x, ws):
        for (w1, w2) in ws:
            x = block_int8(x, w1, w2, rq, rq, 0.05, 0.05,
                           jnp.float32(1e-5), jnp.float32(1e-5))
        return jnp.sum(x.astype(jnp.int32))

    @jax.jit
    def trunk_int8_bf16i(x, ws):
        for (w1, w2) in ws:
            x = block_int8_bf16i(x, w1, w2, 0.05, 0.05,
                                 jnp.float32(1e-5), jnp.float32(1e-5))
        return jnp.sum(x.astype(jnp.int32))

    dtb = timeit(trunk_bf16, (xb, wbs), iters=10, label="C: 9 bf16 blocks (production)")
    dti = timeit(trunk_int8, (x8, w8s), iters=10, label="C: 9 int8 blocks (P1/P2)")
    dtv = timeit(trunk_int8_bf16i, (x8, w8s), iters=10,
                 label="C: 9 int8 blocks (bf16 intermediate)")
    print(f"per-block: bf16 {dtb/9*1e3:.2f} ms  int8 {dti/9*1e3:.2f} ms "
          f"({dtb/dti:.2f}x)  int8/bf16i {dtv/9*1e3:.2f} ms ({dtb/dtv:.2f}x)")


if __name__ == "__main__":
    main()
