"""A/B: blocked-s2d discriminator stem in the REAL fused GAN train step.

The D's first conv is 4×4/s2 on 4-5 input channels — the same
MXU-underfeeding pathology the generator stem had (D-fwd measured at
27.7% of peak, benchmarks/train_ceiling_256.py row C), and the D runs 3
forwards + 2 backwards per fused step.  ``disc_stem_blocked``
(ops/blocked_stem.py) runs the first two layers in 2×2 space-to-depth
layout: conv0 as a stride-4 shifted-copies 6×6 conv, conv1 consuming the
blocked layout directly.

Variants: production fused step at 256² b32 (the train_ceiling_256 row-E
shape; round-4 bar: 120 ms) with the blocked D stem on vs off, plus
isolated D fwd and D fwd+bwd.

Run on the TPU: timeout 1800 python benchmarks/dstem_ab.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    B, H = args.batch, args.size
    rng = np.random.default_rng(0)
    batch = {
        "rgb": rng.random((B, 3, H, H), np.float32),
        "nir": rng.random((B, 1, H, H), np.float32),
    }

    for blocked in (True, False):
        cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
        task = Px2PxTask(cfg)
        task.netD = task.netD.clone(blocked_stem=blocked)
        state = task.init_state(seed=0, image_size=H)
        step = jax.jit(task.make_train_step())
        ex = task.extract_batch(batch)
        ex = {k: jnp.asarray(v) for k, v in ex.items()}

        # fused step: chain state through iterations, sync once at the end
        st = state
        st, m = step(st, ex)
        float(m["model_loss/generator_total_loss"])  # compile+sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, m = step(st, ex)
        lv = float(m["model_loss/generator_total_loss"])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        assert np.isfinite(lv)

        # isolated D fwd / fwd+bwd on the real D input (rgb+nir, 4ch)
        dx = jnp.concatenate([ex["rgb"].astype(task.compute_dtype),
                              ex["nir"].astype(task.compute_dtype)], axis=-1)
        pd = state.params_d

        @jax.jit
        def dfwd(p, x, acc):
            return acc + jnp.sum(task.d_apply(p, x).astype(jnp.float32))

        @jax.jit
        def dfb(p, x, acc):
            def loss(pp):
                return jnp.sum(jnp.square(task.d_apply(pp, x))).astype(
                    jnp.float32)

            l, g = jax.value_and_grad(loss)(p)
            return acc + l + sum(jnp.sum(jnp.square(gg.astype(jnp.float32)))
                                 for gg in jax.tree_util.tree_leaves(g))

        def chain(f):
            acc = f(pd, dx, jnp.zeros((), jnp.float32))
            float(acc)
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = f(pd, dx, acc)
            assert np.isfinite(float(acc))
            return (time.perf_counter() - t0) / args.iters * 1e3

        print(f"blocked_D={str(blocked):5s}  fused step {dt:7.1f} ms   "
              f"D fwd {chain(dfwd):6.2f} ms   D fwd+bwd {chain(dfb):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
