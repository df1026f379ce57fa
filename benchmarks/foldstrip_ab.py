"""Forward-assembly variants for the reflect-fold trunk conv.

The fold wins fwd+bwd but its FORWARD is net-negative at the trunk shape
(padfold_ab FOLD-trunkonly @532²: +4.6 ms fwd vs reflect, while zero-pad
bounds −17.5 ms) — the 4 strip convs + 4 dynamic-update-slices cost more
than the pad they replace.  Variants, all math-identical:

  v0 reflect-pad + conv          (reference)
  v1 conv pad=1                  (bound — borders wrong)
  v2 fold: 4 strip convs + 4 .at[].set       (current ops/reflect_conv.py)
  v3 fold: strips BATCHED into one conv + 4 .at[].set
  v4 fold: batched strips + where-mask assembly (single fused select)
  v5 fold: explicit H-reflect-pad (cheap axis) + 2 W-strips + 2 .at[].set

Run on the TPU: python benchmarks/foldstrip_ab.py [--h 133] [--c 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--h", type=int, default=133)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.pad import reflect_pad2d

    B, H, C = args.batch, args.h, args.c
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, H, H, C), np.float32), jnp.bfloat16)
    kern = jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.02,
                       jnp.bfloat16)
    EPS = jnp.bfloat16(1e-8)
    p = 1

    def v0(x, k):
        return conv2d(reflect_pad2d(x, p), k)

    def v1(x, k):
        return conv2d(x, k, padding=p)

    def _strip_ins(x):
        top = jnp.concatenate([jnp.flip(x[:, 1:p + 1], 1), x[:, :2 * p]], 1)
        bot = jnp.concatenate([x[:, -2 * p:], jnp.flip(x[:, -p - 1:-1], 1)], 1)
        left = jnp.concatenate(
            [jnp.flip(x[:, :, 1:p + 1], 2), x[:, :, :2 * p]], 2)
        right = jnp.concatenate(
            [x[:, :, -2 * p:], jnp.flip(x[:, :, -p - 1:-1], 2)], 2)
        wpad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (p, p), (0, 0)),
                                 mode="reflect")
        hpad = lambda t: jnp.pad(t, ((0, 0), (p, p), (0, 0), (0, 0)),
                                 mode="reflect")
        return wpad(top), wpad(bot), hpad(left), hpad(right)

    def v2(x, k):
        y = conv2d(x, k, padding=p)
        ti, bi, li, ri = _strip_ins(x)
        y = y.at[:, :p].set(conv2d(ti, k))
        y = y.at[:, -p:].set(conv2d(bi, k))
        y = y.at[:, :, :p].set(conv2d(li, k))
        y = y.at[:, :, -p:].set(conv2d(ri, k))
        return y

    def _batched_strips(x, k):
        ti, bi, li, ri = _strip_ins(x)
        s_h = conv2d(jnp.concatenate([ti, bi], 0), k)      # (2B, p, H, C')
        t_, b_ = jnp.split(s_h, 2, axis=0)
        # W-strips in H-layout need the spatially transposed kernel
        li = jnp.transpose(li, (0, 2, 1, 3))
        ri = jnp.transpose(ri, (0, 2, 1, 3))
        kt = jnp.transpose(k, (1, 0, 2, 3))
        s_w = conv2d(jnp.concatenate([li, ri], 0), kt)     # (2B, p, H, C')
        l_, r_ = jnp.split(s_w, 2, axis=0)
        return (t_, b_, jnp.transpose(l_, (0, 2, 1, 3)),
                jnp.transpose(r_, (0, 2, 1, 3)))

    def v3(x, k):
        y = conv2d(x, k, padding=p)
        t_, b_, l_, r_ = _batched_strips(x, k)
        y = y.at[:, :p].set(t_)
        y = y.at[:, -p:].set(b_)
        y = y.at[:, :, :p].set(l_)
        y = y.at[:, :, -p:].set(r_)
        return y

    def v4(x, k):
        y = conv2d(x, k, padding=p)
        t_, b_, l_, r_ = _batched_strips(x, k)
        h = y.shape[1]
        border = (jnp.pad(t_, ((0, 0), (0, h - p), (0, 0), (0, 0)))
                  + jnp.pad(b_, ((0, 0), (h - p, 0), (0, 0), (0, 0)))
                  + jnp.pad(l_[:, p:-p], ((0, 0), (p, p), (0, h - p), (0, 0)))
                  + jnp.pad(r_[:, p:-p], ((0, 0), (p, p), (h - p, 0), (0, 0))))
        ih = jnp.arange(h)
        mask = ((ih < p) | (ih >= h - p))[None, :, None, None]
        mask = mask | mask.transpose(0, 2, 1, 3)
        return jnp.where(mask, border, y)

    # v5: explicit H-reflect-pad (cheap axis) + W-only implicit zero pad
    # + 2 recomputed W strips
    def v5(x, k):
        xh = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)), mode="reflect")
        from jax import lax
        y = lax.conv_general_dilated(
            xh, k.astype(x.dtype), (1, 1), ((0, 0), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        left = jnp.concatenate(
            [jnp.flip(xh[:, :, 1:p + 1], 2), xh[:, :, :2 * p]], 2)
        right = jnp.concatenate(
            [xh[:, :, -2 * p:], jnp.flip(xh[:, :, -p - 1:-1], 2)], 2)
        y = y.at[:, :, :p].set(conv2d(left, k))
        y = y.at[:, :, -p:].set(conv2d(right, k))
        return y

    variants = [("v0 reflect+conv", v0), ("v1 zero bound", v1),
                ("v2 fold 4conv+4DUS", v2), ("v3 batched strips", v3),
                ("v4 batched+where", v4), ("v5 Hpad+2Wstrips", v5)]

    # correctness vs v0 (skip v1)
    ref = np.asarray(v0(x0, kern), np.float32)
    for nm, f in variants[2:]:
        got = np.asarray(f(x0, kern), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        assert got.shape == ref.shape and err < 3e-2, (nm, err)
    print("   (v2..v5 verified ≡ reflect+conv)", flush=True)

    def chk(t):
        return jnp.sum(t.astype(jnp.float32))

    print(f"== fold fwd assembly variants @{H}²×{C} b{B} bf16, "
          f"K={K}/dispatch ==", flush=True)
    for nm, f in variants:
        @jax.jit
        def run(x, k, acc, f=f):
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                y = f(x, k)
                s = s + chk(y)
                x = x + EPS * s.astype(x.dtype)
            return acc + s

        acc = run(x0, kern, jnp.zeros((), jnp.float32))
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = run(x0, kern, acc)
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / args.iters / K
        print(f"{nm:24s} {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
