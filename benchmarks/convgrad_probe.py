"""Backward-pass ledger: where do the training FLOPs stall?

The train-ceiling line (RESULTS.md round 3/4) closed at "XLA's conv-grad
emitter is the ceiling" from a single aggregate number — G bwd = 2.59x fwd
at 256^2 b32.  This probe decomposes that into per-op measurements so the
claim names the actual op: for each hot conv shape of the fused step,
time (a) the forward conv, (b) the grad-input transpose conv, and (c) the
grad-weight contraction, each in isolation (the conv is linear, so taking
jax.vjp and pulling only dx or only dw DCEs everything else).  Also times
instance-norm fwd/bwd and reflect-pad bwd at the trunk shape — the two
non-conv candidates for the gap.

Measurement note (first run, 2026-08-20): one jit dispatch through the
axon tunnel has a ~2 ms floor (an IN fwd whose HBM time is ~0.3 ms read
2.30 ms), so single-op-per-dispatch numbers understate small ops badly.
Each op is therefore applied K times INSIDE one jit, chained through a
scalar perturbation (x += eps*checksum(y)) so XLA cannot DCE or hoist the
repeats, and the dispatch floor is measured explicitly with a null op and
subtracted per dispatch.

Reference analogue: none (torch hides this inside cuDNN autotuning); the
decision this feeds is whether a hand Pallas kernel for the worst grad op
could lift the 47% training MFU, or whether every bwd op is already at the
same wall the forward conv sits at (ops/pallas_trunk.py history).

Run on the TPU: python benchmarks/convgrad_probe.py [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8  # op applications per dispatch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = args.batch
    rng = np.random.default_rng(0)
    EPS = jnp.bfloat16(1e-8)

    def timed(fn, fargs, iters=args.iters):
        acc = fn(*fargs, jnp.zeros((), jnp.float32))
        float(acc)  # compile + sync
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fn(*fargs, acc)
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / iters

    # ---- dispatch floor -------------------------------------------------
    @jax.jit
    def null_op(acc):
        return acc + 1.0

    floor = timed(null_op, ())
    print(f"dispatch floor (null op): {floor*1e3:.2f} ms/dispatch", flush=True)

    def chk(t):
        """Scalar consuming EVERY element.  A channel-0 slice here lets XLA
        slice the conv itself to Cout=1 (first run measured an impossible
        658 TF/s — 255/256 of the conv DCE'd); the full reduce costs ~0.1 ms
        of HBM time and keeps the op honest."""
        return jnp.sum(t.astype(jnp.float32))

    def conv_probe(name, h, cin, cout, k, stride, pad, lhs_dil=None, flop_h=None):
        """Time fwd / grad-input / grad-weight of one conv shape, K per jit."""
        x0 = jnp.asarray(rng.random((B, h, h, cin), np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.random((k, k, cin, cout), np.float32) * 0.01,
                        jnp.bfloat16)

        # Plain-bf16 conv, exactly the production policy (ops/conv.py: no
        # preferred_element_type; MXU accumulates f32 internally regardless).
        def f(x, w):
            return lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                lhs_dilation=lhs_dil,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y_shape = jax.eval_shape(f, x0, w)
        ct0 = jnp.asarray(rng.random(y_shape.shape, np.float32), jnp.bfloat16)

        # K chained applications per dispatch.  The scalar feedback (EPS *
        # checksum) forces iteration i+1 to depend on iteration i's output
        # without changing the op's shape or meaningfully its values.
        @jax.jit
        def fwd(x, w, acc):
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                y = f(x, w)
                s = s + chk(y)
                x = x + EPS * s.astype(jnp.bfloat16)
            return acc + s

        @jax.jit
        def gx(x, w, ct, acc):
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                _, vjp = jax.vjp(f, x, w)
                dx, _ = vjp(ct)
                s = s + chk(dx)
                ct = ct + EPS * s.astype(jnp.bfloat16)
            return acc + s

        @jax.jit
        def gw(x, w, ct, acc):
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                _, vjp = jax.vjp(f, x, w)
                _, dw = vjp(ct)
                s = s + jnp.sum(dw.astype(jnp.float32))
                ct = ct + EPS * s.astype(jnp.bfloat16)
            return acc + s

        # MACs: for lhs-dilated (convT) credit k^2*cin*cout per *input* px,
        # else per output px.
        if flop_h is None:
            flop_h = h if lhs_dil else -(-h // stride) if pad else (h - k) // stride + 1
        n_out = flop_h * flop_h
        flops = 2 * k * k * cin * cout * n_out * B
        t_f = (timed(fwd, (x0, w)) - floor) / K
        t_x = (timed(gx, (x0, w, ct0)) - floor) / K
        t_w = (timed(gw, (x0, w, ct0)) - floor) / K
        print(f"{name:34s} fwd {t_f*1e3:6.2f} ms ({flops/t_f/1e12:5.1f} TF/s)"
              f" | d/dx {t_x*1e3:6.2f} ({flops/t_x/1e12:5.1f})"
              f" | d/dw {t_w*1e3:6.2f} ({flops/t_w/1e12:5.1f})"
              f" | bwd/fwd {(t_x+t_w)/t_f:4.2f}x", flush=True)
        return t_f, t_x, t_w

    print(f"== conv grads, b{B}, bf16, K={K}/dispatch, floor-corrected "
          f"(v5e bf16 peak 197 TF/s) ==", flush=True)

    # Training at 256^2 (+20 pad = 276^2): trunk 3x3 256ch @69^2 x18 convs.
    conv_probe("trunk 3x3 256ch @69^2 (train)", 69, 256, 256, 3, 1, 1)
    # Serving/512^2-train trunk shape.
    conv_probe("trunk 3x3 256ch @133^2 (512^2)", 133, 256, 256, 3, 1, 1)
    # Down convs (276^2 train path).
    conv_probe("d0 3x3/s2 64->128 @276^2", 276, 64, 128, 3, 2, 1)
    conv_probe("d1 3x3/s2 128->256 @138^2", 138, 128, 256, 3, 2, 1)
    # Up convs (lhs-dilated transposed form, ops/conv.py).
    conv_probe("u0 convT 256->128 @69^2", 69, 256, 128, 3, 1, 1,
               lhs_dil=(2, 2), flop_h=69)
    conv_probe("u1 convT 128->64 @138^2", 138, 128, 64, 3, 1, 1,
               lhs_dil=(2, 2), flop_h=138)
    # D tower hot conv (4-ch pair, 4x4/s2).
    conv_probe("D c1 4x4/s2 64->128 @138^2", 138, 64, 128, 4, 2, 1)

    # ---- non-conv candidates at the trunk shape ------------------------
    h, c = 69, 256
    x = jnp.asarray(rng.random((B, h, h, c), np.float32), jnp.bfloat16)
    ct = jnp.asarray(rng.random((B, h, h, c), np.float32), jnp.bfloat16)

    from nirgan_tpu.ops import instance_norm, reflect_pad2d

    def in_f(x):
        return instance_norm(x)

    def pad_f(x):
        return reflect_pad2d(x, 1)

    ct_pad = jnp.asarray(rng.random((B, h + 2, h + 2, c), np.float32),
                         jnp.bfloat16)

    def chained(g, out_like_in=True):
        @jax.jit
        def run(x, acc):
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                y = g(x)
                s = s + chk(y)
                x = x + EPS * s.astype(jnp.bfloat16)
            return acc + s
        return run

    def chained_bwd(g, ct):
        @jax.jit
        def run(x, ct, acc):
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                _, vjp = jax.vjp(g, x)
                (dx,) = vjp(ct)
                s = s + chk(dx)
                x = x + EPS * s.astype(jnp.bfloat16)
            return acc + s
        return run

    for name, fn, fa in (
        ("IN fwd @69^2x256", chained(in_f), (x,)),
        ("IN bwd", chained_bwd(in_f, ct), (x, ct)),
        ("reflect-pad-1 fwd", chained(pad_f), (x,)),
        ("reflect-pad-1 bwd", chained_bwd(pad_f, ct_pad), (x, ct_pad)),
    ):
        dt = (timed(fn, fa) - floor) / K
        print(f"{name:34s} {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
