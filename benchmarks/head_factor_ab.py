"""A/B: head-conv blocking factor 4 (production) vs 8 vs 16 (pad+crop).

The 7×7 64→1 head at 532² is lane-capped: blocked factor f gives Cout=f²
output lanes but (6+f)²/49 × the MACs.  f=4: 16/128 lanes, 2.04× MACs
(production, 16.7 ms isolated).  f=8: 64/128 lanes, 4× MACs, needs the
output grid padded 532→536 (+1.5% compute, cropped after).  Run on TPU:
    python benchmarks/head_factor_ab.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nirgan_tpu.ops.blocked_stem import conv_valid_blocked


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
    print(f"{label:44s} {1000*dt/iters:7.2f} ms/batch")


def main():
    rng = np.random.default_rng(0)
    b = 32
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 1)), jnp.bfloat16) * 0.05
    bias = jnp.asarray([0.01], jnp.bfloat16)
    # head input: 532² + reflect-pad-3 = 538²
    xs = [jnp.asarray(rng.standard_normal((b, 538, 538, 64)), jnp.bfloat16)
          for _ in range(2)]

    @jax.jit
    def f4(x, acc):
        y = conv_valid_blocked(x, k, bias, factor=4)
        return acc + jnp.sum(y.astype(jnp.float32))

    def make_padded(f, hout_pad):
        extra = hout_pad - 532

        @jax.jit
        def fn(x, acc):
            xp = jnp.pad(x, ((0, 0), (0, extra), (0, extra), (0, 0)))
            y = conv_valid_blocked(xp, k, bias, factor=f)
            y = y[:, :532, :532]
            return acc + jnp.sum(y.astype(jnp.float32))

        return fn

    # correctness vs f4 first
    y4 = conv_valid_blocked(xs[0][:1], k, bias, factor=4)
    for f, hp in ((8, 536), (16, 544)):
        extra = hp - 532
        xp = jnp.pad(xs[0][:1], ((0, 0), (0, extra), (0, extra), (0, 0)))
        yf = conv_valid_blocked(xp, k, bias, factor=f)[:, :532, :532]
        err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) - y4.astype(jnp.float32))))
        print(f"f={f}: max |Δ| vs f4 = {err:.4f}")

    measure(f4, xs, label="head factor=4 (production)")
    measure(make_padded(8, 536), xs, label="head factor=8 (pad 536, crop)")
    measure(make_padded(16, 544), xs, label="head factor=16 (pad 544, crop)")


if __name__ == "__main__":
    main()
