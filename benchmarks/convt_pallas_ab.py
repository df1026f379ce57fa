"""A/B: Pallas convT backward kernels vs XLA's derived gradients.

Shapes: u1 (ct 276²×64, z 138²×128 — the measured pathology: XLA dx
4.3-4.7 ms / dw 4.9-5.2 ms at b32) and u0 (ct 138²×128, z 69²×256 —
XLA already fast there; the kernel must not regress it if enabled).

Run on the TPU: python benchmarks/convt_pallas_ab.py [--batch 32]
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nirgan_tpu.ops.pallas_convt_bwd import (
        convt_bwd_supported,
        convt_k3s2_bwd,
    )

    B = args.batch
    rng = np.random.default_rng(0)
    EPS = jnp.bfloat16(1e-8)
    _DIMSPEC = ("NHWC", "HWIO", "NHWC")

    def timed(fn, fargs, iters=args.iters):
        acc = fn(*fargs, jnp.zeros((), jnp.float32))
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fn(*fargs, acc)
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def null_op(acc):
        return acc + 1.0

    floor = timed(null_op, ())
    print(f"dispatch floor: {floor*1e3:.2f} ms", flush=True)

    def chk(t):
        return jnp.sum(t.astype(jnp.float32))

    def bench(name, f, fargs, flops):
        @jax.jit
        def run(args_, acc):
            ct = args_[0]
            s = jnp.zeros((), jnp.float32)
            for _ in range(K):
                y = f(ct, *args_[1:])
                s = s + chk(y)
                ct = ct + EPS * s.astype(ct.dtype)
            return acc + s

        dt = (timed(run, (fargs,)) - floor) / K
        print(f"{name:34s} {dt*1e3:6.2f} ms ({flops/dt/1e12:5.1f} TF/s)",
              flush=True)
        return dt

    def u1_fwd_factory(ci, co):
        def u1_fwd(z, w):
            fl = jnp.flip(w, axis=(0, 1)).astype(z.dtype)
            return lax.conv_general_dilated(
                z, fl, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
                dimension_numbers=_DIMSPEC)
        return u1_fwd

    for tag, hi, ci, co in (("u1", 138, 128, 64), ("u0", 138, 256, 128)):
        z = jnp.asarray(rng.random((B, hi, hi, ci), np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.random((3, 3, ci, co), np.float32) * 0.05,
                        jnp.bfloat16)
        ct = jnp.asarray(rng.random((B, 2 * hi, 2 * hi, co), np.float32),
                         jnp.bfloat16)
        if not convt_bwd_supported(ct.shape, w.shape):
            print(f"[{tag}] unsupported shape, skipped", flush=True)
            continue
        flops = 2 * 9 * ci * co * hi * hi * B
        u1_fwd = u1_fwd_factory(ci, co)

        # correctness on-device first
        _, vjp = jax.vjp(u1_fwd, z, w)
        dz_ref, dw_ref = vjp(ct)
        dz, dw = convt_k3s2_bwd(ct, z, w)
        e1 = float(jnp.max(jnp.abs(dz.astype(jnp.float32)
                                   - dz_ref.astype(jnp.float32)))
                   / jnp.max(jnp.abs(dz_ref.astype(jnp.float32))))
        e2 = float(jnp.max(jnp.abs(dw - dw_ref.astype(jnp.float32)))
                   / jnp.max(jnp.abs(dw_ref.astype(jnp.float32))))
        print(f"[{tag}] on-device correctness: dx rel={e1:.2e} dw rel={e2:.2e}",
              flush=True)
        assert e1 < 3e-2 and e2 < 3e-2, (tag, e1, e2)

        def xla_both(ct, z, w):
            _, vjp = jax.vjp(u1_fwd, z, w)
            dz, dw = vjp(ct)
            return dz + 0 * jnp.sum(dw)  # consume both

        def xla_both_full(ct, z, w):
            _, vjp = jax.vjp(u1_fwd, z, w)
            dz, dw = vjp(ct)
            return jnp.sum(dz.astype(jnp.float32)) + jnp.sum(
                dw.astype(jnp.float32))

        # dx+dw together, both stacks (2× flops credit)
        bench(f"[{tag}] dx+dw XLA-derived",
              lambda c, z, w: xla_both_full(c, z, w), (ct, z, w), 2 * flops)
        bench(f"[{tag}] dx+dw pallas fused",
              lambda c, z, w: sum(jnp.sum(t.astype(jnp.float32))
                                  for t in convt_k3s2_bwd(c, z, w)),
              (ct, z, w), 2 * flops)


if __name__ == "__main__":
    main()
