"""In-context cost of the reflect pads: real generator, reflect vs zero.

Isolated-op probes (trainledger_probe.py) price the reflect pads high:
trunk pad-1 @69²×256 fwd 0.46 / bwd 0.95 ms (×18), head pad-3 @276²×64
fwd 4.25 / bwd 8.28 ms — ~25 ms of the 136 ms fused step if taken at
face value.  But isolated rows ignore producer/consumer fusion, and the
round-2 512² serving ledger books IN+pads at only ~14 ms — so before
building a pad-fold (zero-SAME conv + recomputed border strips), this
A/B measures what the pads cost in the REAL graph:

  reflect      production (padding_type='reflect', head/stem reflect-3)
  zero-trunk   padding_type='zero' (trunk convs pad=1 inside the conv)
  zero-all     + stem/head reflect-3 replaced by zero-pad-3 (monkeypatch)

Each variant: fwd-only (serving-relevant) and fwd+bwd-wrt-params
(train-relevant), b32 @276² (the 256²+pad-10 train shape), bf16, timed
with chained scalar feedback and one final sync.  zero-* variants change
border math — they are NOT parity-correct; this is a bound, not a mode.

Run on the TPU: python benchmarks/padfold_ab.py [--batch 32] [--size 276]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=276)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    import nirgan_tpu.models.generator as gen_mod
    from nirgan_tpu.models.generator import ResnetGenerator

    B, H = args.batch, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, H, 3), np.float32), jnp.bfloat16)
    ct = jnp.asarray(rng.random((B, H, H, 1), np.float32), jnp.bfloat16)

    real_pad = gen_mod._pad
    real_c2r = gen_mod.conv2d_reflect
    real_cvbr = gen_mod.conv_valid_blocked_reflect

    from nirgan_tpu.ops.blocked_stem import conv_valid_blocked
    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.pad import reflect_pad2d

    def unfused_c2r(x, k, b=None, pad=1):
        return conv2d(reflect_pad2d(x, pad), k, b)

    def unfused_cvbr(x, k, b=None, factor=4):
        return conv_valid_blocked(reflect_pad2d(x, 3), k, b, factor=factor)

    def zero_pad(x, padding_type, amount=1):
        return jnp.pad(x, ((0, 0), (amount, amount), (amount, amount), (0, 0)))

    def run_variant(label, padding_type, patch_all, fold=False,
                    unfold_trunk=False, unfold_head=False):
        gen_mod._pad = zero_pad if patch_all else real_pad
        gen_mod.conv2d_reflect = unfused_c2r if unfold_trunk else real_c2r
        gen_mod.conv_valid_blocked_reflect = (
            unfused_cvbr if unfold_head else real_cvbr)
        try:
            model = ResnetGenerator(
                input_nc=3, output_nc=1, ngf=64, norm_type="instance",
                padding_type=padding_type, compute_dtype=jnp.bfloat16,
                reflect_fold=fold)
            params = model.init(jax.random.PRNGKey(0), x[:1])

            @jax.jit
            def fwd(params, x, acc):
                y = model.apply(params, x)
                return acc + jnp.sum((y.astype(jnp.float32)))

            @jax.jit
            def fwdbwd(params, x, ct, acc):
                def loss(p):
                    # train=True: the trunk/stem folds are train-gated
                    # (generator.py), so the training graph is the one
                    # this row exists to measure
                    y = model.apply(p, x, train=True)
                    return jnp.sum(y * ct).astype(jnp.float32)

                l, grads = jax.value_and_grad(loss)(params)
                lv = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree_util.tree_leaves(grads))
                return acc + l + lv

            for name, fn, fargs in (("fwd", fwd, (params, x)),
                                    ("fwd+bwd", fwdbwd, (params, x, ct))):
                acc = fn(*fargs, jnp.zeros((), jnp.float32))
                float(acc)  # compile+sync
                acc = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    acc = fn(*fargs, acc)
                assert np.isfinite(float(acc))
                dt = (time.perf_counter() - t0) / args.iters
                print(f"{label:12s} {name:8s} {dt*1e3:7.2f} ms", flush=True)
        finally:
            gen_mod._pad = real_pad
            gen_mod.conv2d_reflect = real_c2r
            gen_mod.conv_valid_blocked_reflect = real_cvbr

    print(f"== generator pad A/B, b{B} @{H}², bf16 ==", flush=True)
    run_variant("reflect", "reflect", False)
    run_variant("FOLDED", "reflect", False, fold=True)
    run_variant("FOLD-headonly", "reflect", False, fold=True,
                unfold_trunk=True)
    run_variant("FOLD-trunkonly", "reflect", False, fold=True,
                unfold_head=True)
    run_variant("zero-trunk", "zero", False)
    run_variant("zero-all", "zero", True)


if __name__ == "__main__":
    main()
