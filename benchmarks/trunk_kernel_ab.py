"""Fused trunk kernel A/B (VERDICT round-2 directive 1).

Run on the TPU: PYTHONPATH=. python benchmarks/trunk_kernel_ab.py

Step 1: correctness + isolated speed of the Pallas 3×3 conv vs XLA's
lax.conv at the trunk shape (b32, 133², 256ch, bf16).  XLA's trunk convs
measure 83-87% of v5e peak (RESULTS.md); the kernel must land close for the
fused-block HBM savings (~24 ms of IN/pad traffic) to be net-positive.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=20, label=""):
    acc = jnp.zeros((), jnp.float32)

    @jax.jit
    def step(acc, *a):
        return acc + jnp.sum(fn(*a).astype(jnp.float32))

    acc = step(acc, *args)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:52s} {1000*dt:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=133)
    ap.add_argument("--rh", type=int, default=19)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    from nirgan_tpu.ops.pallas_trunk import conv3x3_pallas

    b, s, c = args.batch, args.size, 256
    w_in = ((s + 2 + 7) // 8) * 8 + 8   # 144 for s=133: halo + junk, 8-aligned
    w_out = ((s + 7) // 8) * 8  # 136
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s + 2, w_in, c)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)), jnp.bfloat16)

    def xla_conv(xp, wk):
        return jax.lax.conv_general_dilated(
            xp, wk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # --- correctness (small): real cols of the pallas output == XLA VALID
    xs = jnp.asarray(rng.standard_normal((2, 21, 144, c)), jnp.bfloat16)
    ref = np.asarray(xla_conv(xs, w), np.float32)            # (2, 19, 142, c)
    got = np.asarray(conv3x3_pallas(xs, w, rh=19), np.float32)   # (2,19,136,c)
    err = np.max(np.abs(ref[:, :, :136] - got))
    denom = np.abs(ref).max()
    print(f"correctness: max|Δ|={err:.4f} rel={err/denom:.2e}")
    assert err / denom < 2e-2, "kernel wrong"

    flops = 2.0 * b * s * s * 9 * c * c  # useful flops (133² real outputs)
    x_xla = x[:, :, :s + 2, :]
    dt_xla = timeit(xla_conv, (x_xla, w), label="XLA conv3x3 VALID bf16 (135-wide in)")
    print(f"    -> {flops/dt_xla/1e12:6.1f} TFLOP/s ({100*flops/dt_xla/197e12:.0f}% of v5e peak)")
    for rh in (7, 19):
        dt_pl = timeit(lambda xx, ww: conv3x3_pallas(xx, ww, rh=rh),
                       (x, w), label=f"pallas conv3x3 rh={rh} ({w_in}-wide in)")
        print(f"    -> {flops/dt_pl/1e12:6.1f} TFLOP/s ({100*flops/dt_pl/197e12:.0f}% of v5e peak)")

    # --- v2: in-kernel-reflect, 3-DMA-window form (round 5) -------------
    # Known hardware verdict: Mosaic rejects the ±1-column DMA windows
    # ("Slice shape along dimension 2 must be aligned to tiling (8)") —
    # see the CLOSED note in ops/pallas_trunk.py.  The leg stays here so a
    # future Mosaic that relaxes the rule re-opens the line automatically.
    from nirgan_tpu.ops.pallas_trunk import conv3x3_reflect_pallas
    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.pad import reflect_pad2d

    def xla_reflect(xx, ww):
        return jax.lax.conv_general_dilated(
            reflect_pad2d(xx[:, :, :s], 1), ww, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    x2 = jnp.asarray(rng.standard_normal((b, s, w_out, c)), jnp.bfloat16)
    dt_xr = timeit(xla_reflect, (x2, w), label="XLA reflect_pad+conv (the op v2 replaces)")
    print(f"    -> {flops/dt_xr/1e12:6.1f} TFLOP/s ({100*flops/dt_xr/197e12:.0f}% of v5e peak)")
    try:
        ref2 = np.asarray(
            conv2d(reflect_pad2d(x2[:2, :, :s].astype(jnp.float32), 1),
                   w.astype(jnp.float32)), np.float32)
        got2 = np.asarray(conv3x3_reflect_pallas(x2[:2], w, rh=19, wreal=s),
                          np.float32)
        err2 = np.max(np.abs(ref2 - got2[:, :, :s]))
        print(f"v2 correctness: max|Δ|={err2:.4f} rel={err2/np.abs(ref2).max():.2e}")
        assert err2 / np.abs(ref2).max() < 2e-2, "v2 kernel wrong"
        for rh in (7, 19):
            dt_v2 = timeit(
                lambda xx, ww: conv3x3_reflect_pallas(xx, ww, rh=rh, wreal=s),
                (x2, w), label=f"pallas v2 reflect rh={rh} ({w_out}-wide raw in)")
            print(f"    -> {flops/dt_v2/1e12:6.1f} TFLOP/s "
                  f"({100*flops/dt_v2/197e12:.0f}% of v5e peak)")
    except Exception as e:
        print(f"v2 leg CLOSED on this toolchain: {type(e).__name__}: "
              f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
