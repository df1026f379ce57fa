"""A/B: stem-pad + task-pad folding in the REAL serving/training graphs.

Round-5 change (ops/reflect_conv.py stem_downsample_blocked_reflect +
generator outer_pad): the serving forward used to pay TWO explicit reflect
pads of the big 3-channel input — the task's edge-artifact pad-10
(model/pix2pix.py:91-93) and the stem's pad-3 (networks.py:341) — each a
relayout + fusion barrier (~11 ms each of the 124 ms 532² b32 forward,
padfold_ab zero-all gap).  Both are now folded into the blocked stem conv's
implicit zero padding with exact composed-reflect border strips.

Variants (monkeypatching the generator's fold entry point; "outer folded,
pad-3 explicit" is not decomposable — the composition is index-wise):
  prod        both folds on (shipped round-5 path)
  stem-only   task pad explicit, stem pad-3 folded
  none        round-4 production (both pads explicit)

Measures the REAL task graphs: serving g_apply fwd (512²+pad-10, b128 —
the bench.py shape) and training G fwd+bwd (256²+pad-10, b32).

Run on the TPU: timeout 1800 python benchmarks/stemfold_ab.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--serve-batch", type=int, default=128)
    ap.add_argument("--serve-size", type=int, default=512)
    ap.add_argument("--train-batch", type=int, default=32)
    ap.add_argument("--train-size", type=int, default=256)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    import nirgan_tpu.models.generator as gen_mod
    from nirgan_tpu.config import load_config
    from nirgan_tpu.ops.blocked_stem import stem_downsample_blocked
    from nirgan_tpu.ops.pad import reflect_pad2d
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
    task = Px2PxTask(cfg)
    # the A/B drives the opt-in fold path (default is explicit pads —
    # measured verdict in the generator's fold_input_pads docstring)
    task.netG = task.netG.clone(fold_input_pads=True)
    state = task.init_state(seed=0, image_size=args.serve_size)
    params = state.params_g

    real_fold = gen_mod.stem_downsample_blocked_reflect

    def stem_only(x, k7, b7, k3, b3, eps=1e-5, outer=0):
        # task pad explicit, stem pad-3 folded (the round-5 intermediate)
        return real_fold(reflect_pad2d(x, outer), k7, b7, k3, b3, eps=eps,
                         outer=0)

    def none_fold(x, k7, b7, k3, b3, eps=1e-5, outer=0):
        # round-4 production: both pads explicit
        return stem_downsample_blocked(
            reflect_pad2d(reflect_pad2d(x, outer), 3), k7, b7, k3, b3,
            eps=eps)

    rng = np.random.default_rng(0)
    xs_serve = jnp.asarray(
        rng.random((args.serve_batch, args.serve_size, args.serve_size, 3),
                   np.float32))
    xs_train = jnp.asarray(
        rng.random((args.train_batch, args.train_size, args.train_size, 3),
                   np.float32))
    ct = jnp.asarray(
        rng.random((args.train_batch, args.train_size, args.train_size, 1),
                   np.float32), jnp.bfloat16)

    def timeit(fn, *fargs):
        acc = fn(*fargs, jnp.zeros((), jnp.float32))
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(*fargs, acc)
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / args.iters * 1e3

    def run(label):
        @jax.jit
        def serve(p, x, acc):
            y = task.g_apply(p, x.astype(task.compute_dtype), train=False)
            return acc + jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def traing(p, x, ct, acc):
            def loss(pp):
                y = task.g_apply(pp, x.astype(task.compute_dtype), train=True)
                return jnp.sum(y * ct).astype(jnp.float32)

            l, g = jax.value_and_grad(loss)(p)
            lv = sum(jnp.sum(jnp.square(gg.astype(jnp.float32)))
                     for gg in jax.tree_util.tree_leaves(g))
            return acc + l + lv

        ms_s = timeit(serve, params, xs_serve)
        tps = args.serve_batch / (ms_s / 1e3)
        ms_t = timeit(traing, params, xs_train, ct)
        print(f"{label:10s} serve b{args.serve_batch} {ms_s:7.1f} ms "
              f"({tps:6.1f} t/s)   G-fwd+bwd b{args.train_batch} "
              f"{ms_t:7.1f} ms", flush=True)

    print(f"== stem/outer pad fold A/B, serve {args.serve_size}²+pad-10 "
          f"b{args.serve_batch}, train {args.train_size}²+pad-10 "
          f"b{args.train_batch}, bf16 ==", flush=True)
    for label, impl in (("prod", real_fold), ("stem-only", stem_only),
                        ("none", none_fold)):
        gen_mod.stem_downsample_blocked_reflect = impl
        try:
            run(label)
        finally:
            gen_mod.stem_downsample_blocked_reflect = real_fold


if __name__ == "__main__":
    main()
