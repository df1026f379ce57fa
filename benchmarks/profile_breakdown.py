"""In-context per-section timing of the serving forward (the method that
found round 2's wins — isolated microbenchmarks mislead because XLA fuses
differently in context; see benchmarks/RESULTS.md).

Times cumulative prefixes of the real generator graph by truncating the
forward at section boundaries, so each section's in-context cost is the
difference of adjacent rows.  Run on the TPU:

    python benchmarks/profile_breakdown.py [--batch 32] [--size 512]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    task = Px2PxTask(cfg)
    params = task.init_state(seed=0, image_size=256).params_g
    netG = task.netG
    n_blocks = netG.n_blocks

    # capture per-section outputs by monkey-wrapping the module __call__ is
    # brittle; instead rebuild the forward from the module's own submodule
    # calls via flax's capture of intermediates
    def forward_upto(upto: str):
        def fn(p, x):
            _, state = netG.apply(
                {"params": p}, x.astype(task.compute_dtype),
                capture_intermediates=lambda mdl, _: True, mutable=["intermediates"])
            inter = state["intermediates"]

            out = inter[upto]["__call__"][0]
            return jnp.sum(out.astype(jnp.float32))

        return jax.jit(fn)

    def full_forward():
        def fn(p, x):
            return jnp.sum(task.g_apply(p, x, train=False).astype(jnp.float32))

        return jax.jit(fn)

    # blocked mode folds c0/d0/c1 into fused ops whose captured outputs are
    # param tuples, so profile from d1 onward and close with the full forward
    sections = ["d1"] + [f"r{i}" for i in range(n_blocks)] + ["u0", "u1"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.size + 20, args.size + 20, 3),
                               dtype=np.float32))

    prev = 0.0
    print(f"{'section':10s} {'cum ms':>9s} {'delta ms':>9s}")
    for s in sections + ["FULL"]:
        f = full_forward() if s == "FULL" else forward_upto(s)
        try:
            acc = f(params, x)
            float(acc)
        except Exception as e:
            print(f"{s:10s}  (skipped: {type(e).__name__})")
            continue
        t0 = time.perf_counter()
        accs = [f(params, x) for _ in range(args.iters)]
        float(accs[-1])
        cum = 1000 * (time.perf_counter() - t0) / args.iters
        print(f"{s:10s} {cum:9.2f} {cum - prev:9.2f}")
        prev = cum


if __name__ == "__main__":
    main()
