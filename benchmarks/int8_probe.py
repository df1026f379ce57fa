"""Probe: does the v5e MXU int8 path (394.5 TOPS peak, 2x bf16) pay off for
the serving generator's dominant shapes through XLA's conv emitter?

The trunk conv3x3 at 256ch/133^2 carries ~77% of the serving FLOPs
(RESULTS.md FLOP ledger); the stem/head run blocked (s2d-in-conv).  If the
int8 conv is ~2x bf16 here, a quantised serving mode (per-channel weight
scales + per-tensor activation scale, PSNR-guarded) beats the 291 tiles/s
headline by a large margin; if XLA emits int8 convs at bf16 speed (or
upcasts), the line is CLOSED and recorded in RESULTS.md.

Run on the TPU: python benchmarks/int8_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def time_fn(fn, args, iters=30, label=""):
    acc = fn(*args)
    np.asarray(acc)  # compile + execute barrier (single pull; axon tunnel)
    t0 = time.perf_counter()
    accs = None
    for _ in range(iters):
        accs = fn(*args)
    np.asarray(accs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:52s} {dt*1e3:8.3f} ms")
    return dt


def conv(x, w, dtype_out):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype_out)


def main():
    rng = np.random.default_rng(0)
    B, S, C = 32, 133, 256  # trunk block shape at 512^2+pad serving, b32
    flops = 2 * 9 * C * C * S * S * B

    x8 = jnp.asarray(rng.integers(-127, 127, (B, S, S, C), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C), dtype=np.int8))
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    @jax.jit
    def f_bf16(x, w):
        return jnp.sum(conv(x, w, jnp.float32))

    @jax.jit
    def f_int8(x, w):
        return jnp.sum(conv(x, w, jnp.int32))

    @jax.jit
    def f_int8_chain(x, w):
        # int8 in, int32 acc, rescale + clip back to int8 (the real serving
        # pattern: quantised activations flow block to block)
        y = conv(x, w, jnp.int32)
        y = jnp.clip((y.astype(jnp.float32) * 1e-4), -127, 127).astype(jnp.int8)
        return jnp.sum(y.astype(jnp.int32))

    dt_b = time_fn(f_bf16, (xb, wb), label=f"bf16 conv3x3 {C}ch {S}^2 b{B}")
    print(f"{'':52s} {flops/dt_b/1e12:8.1f} TF/s ({100*flops/dt_b/197e12:.0f}% bf16 peak)")
    dt_i = time_fn(f_int8, (x8, w8), label=f"int8 conv3x3 (int32 acc)")
    print(f"{'':52s} {flops/dt_i/1e12:8.1f} TOP/s ({100*flops/dt_i/394.5e12:.0f}% int8 peak)")
    dt_c = time_fn(f_int8_chain, (x8, w8), label=f"int8 conv3x3 + requant to int8")
    print(f"speedup int8/bf16: {dt_b/dt_i:.2f}x   chained: {dt_b/dt_c:.2f}x")


if __name__ == "__main__":
    main()
