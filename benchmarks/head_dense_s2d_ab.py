"""A/B: dense 3×3 s2d-4 head conv fed by strided-slice blocking.

History (RESULTS.md): the dense blocked head conv is fast (6.1 ms) but the
monolithic XLA s2d shuffle of its input costs 23 ms.  This variant builds
the blocked-padded input as
  pad W→540 (free-ish) → reshape (B,H,135,256) [W,C adjacent: free]
  → 4 strided H-slices [uq::4] → channel concat
i.e. row-granular copies instead of an element transpose.  Run on TPU:
    python benchmarks/head_dense_s2d_ab.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nirgan_tpu.ops.blocked_stem import conv_valid_blocked

DIMS = ("NHWC", "HWIO", "NHWC")
F = 4


def dense_blocked_kernel(k7):
    """(7,7,Cin,1) → (3,3,16·Cin,16): out_blk[Y,S,(p,q)] over xb[R,S,(uq,vq,c)]
    with xb[R] covering padded rows 4R..4R+3 (pad offset 3)."""
    kh, kw, cin, cout = k7.shape
    k7 = np.asarray(k7, np.float32)
    k = np.zeros((3, 3, F * F * cin, F * F * cout), np.float32)
    for J in range(3):
        for K in range(3):
            for uq in range(F):
                for vq in range(F):
                    for p in range(F):
                        for q in range(F):
                            dy = 4 * J + uq - p   # = dy_tap + 3 ∈ [0,7)
                            dx = 4 * K + vq - q
                            if 0 <= dy < kh and 0 <= dx < kw:
                                ci = (uq * F + vq) * cin
                                co = p * F + q
                                k[J, K, ci:ci + cin, co] = k7[dy, dx, :, 0]
    return jnp.asarray(k)


def blocked_input(x):
    """(B,532,532,64) → (B,135,135,1024): reflect-pad-3 + s2d-4 via
    pad→free W reshape→strided H slices."""
    b, _, _, cin = x.shape
    # reflect-pad 3 both dims, zero-pad tails to 540
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)), mode="reflect")
    xw = xp.reshape(b, 540, 135, 4 * cin)       # free: W,C adjacent
    rows = [xw[:, uq::4] for uq in range(4)]    # 4 strided row-slices
    # channel order: (uq,(vq,c)) → matches kernel (uq*4+vq)*cin+c
    return jnp.concatenate(rows, axis=-1)


def head_dense(x, kblk, bias):
    xb = blocked_input(x)
    y = lax.conv_general_dilated(xb, kblk.astype(x.dtype), (1, 1),
                                 ((0, 0), (0, 0)), dimension_numbers=DIMS)
    bb, gh, gw, _ = y.shape
    y = y.reshape(bb, gh, gw, F, F).transpose(0, 1, 3, 2, 4)
    y = y.reshape(bb, gh * F, gw * F, 1)
    return y[:, :532, :532] + bias


def measure(fn, xs, iters=30, label=""):
    acc = jnp.zeros((), jnp.float32)
    acc = fn(xs[0], acc)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(xs[i % len(xs)], acc)
    float(acc)
    print(f"{label:46s} {1000*(time.perf_counter()-t0)/iters:7.2f} ms/batch")


def main():
    rng = np.random.default_rng(0)
    b = 32
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 1)), jnp.float32) * 0.05
    kblk = dense_blocked_kernel(k)
    bias = jnp.float32(0.01)
    # UNPADDED input this time (the pipeline includes the pad)
    xs = [jnp.asarray(rng.standard_normal((b, 532, 532, 64)), jnp.bfloat16)
          for _ in range(2)]

    # correctness: vs pad + production strided head
    x1 = xs[0][:1].astype(jnp.float32)
    ref = conv_valid_blocked(jnp.pad(x1, ((0, 0), (3, 3), (3, 3), (0, 0)),
                                     mode="reflect"), k, None, factor=4) + bias
    got = head_dense(x1, kblk, bias)
    print("max |Δ| vs production:",
          float(jnp.max(jnp.abs(got - ref))))

    @jax.jit
    def prod(x, acc):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = conv_valid_blocked(
            xp, k.astype(jnp.bfloat16), jnp.asarray([0.01], jnp.bfloat16),
            factor=4)
        return acc + jnp.sum(y.astype(jnp.float32))

    kb = kblk.astype(jnp.bfloat16)

    @jax.jit
    def dense(x, acc):
        y = head_dense(x, kb, jnp.bfloat16(0.01))
        return acc + jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def blocked_only(x, acc):  # input-build cost alone
        xb = blocked_input(x)
        return acc + jnp.sum(xb[:, ::7, ::7, :3].astype(jnp.float32))

    measure(prod, xs, label="production pad + strided-4 head")
    measure(dense, xs, label="strided-slice s2d + dense 3x3 head")
    measure(blocked_only, xs, label="  (input blocking alone)")


if __name__ == "__main__":
    main()
