"""Throughput experiments for the 512² inference path.

Run on the TPU:  python benchmarks/perf_experiments.py
Prints tiles/sec for each variant; used to steer kernel-level optimisation
(results recorded in benchmarks/RESULTS.md).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def measure(fn, params, xs, iters=20, label=""):
    acc = jnp.zeros((), jnp.float32)
    acc = fn(params, xs[0], acc)
    float(acc)  # compile + warm
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(params, xs[i % len(xs)], acc)
    float(acc)
    dt = time.perf_counter() - t0
    batch = xs[0].shape[0]
    tps = batch * iters / dt
    print(f"{label:48s} {tps:8.1f} tiles/s   ({1000*dt/iters:.1f} ms/batch of {batch})")
    return tps


def build(task):
    @jax.jit
    def fn(p, x, acc):
        pred = task.g_apply(p, x, train=False)
        return acc + jnp.sum(pred.astype(jnp.float32))

    return fn


def main():
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    rng = np.random.default_rng(0)

    def xs_for(batch, size):
        return [jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32))
                for _ in range(2)]

    cfg = load_config("configs/config_px2px.yaml")
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=256)
    p = state.params_g

    fn = build(task)
    for b in (4, 8, 16, 32):
        measure(fn, p, xs_for(b, 512), label=f"pad10 bf16 batch={b}")

    # no reflect padding: 512 exact (alignment probe)
    cfg2 = load_config("configs/config_px2px.yaml")
    cfg2.Data.padding = False
    t2 = Px2PxTask(cfg2)
    measure(build(t2), p, xs_for(8, 512), label="nopad bf16 batch=8 (512 aligned)")
    measure(build(t2), p, xs_for(16, 512), label="nopad bf16 batch=16 (512 aligned)")

    # f32 compute for comparison
    cfg3 = load_config("configs/config_px2px.yaml")
    cfg3.tpu.compute_dtype = "float32"
    t3 = Px2PxTask(cfg3)
    measure(build(t3), p, xs_for(8, 512), label="pad10 f32 batch=8")


if __name__ == "__main__":
    main()


def extra():
    """Round-2 A/B: blocked stem/head vs the round-1 unblocked path, and
    batch scaling (history in RESULTS.md)."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    rng = np.random.default_rng(0)
    cfg = load_config("configs/config_px2px.yaml")
    task = Px2PxTask(cfg)
    p = task.init_state(seed=0, image_size=256).params_g
    for b in (32, 64):
        xs = [jnp.asarray(rng.random((b, 512, 512, 3), dtype=np.float32))
              for _ in range(2)]
        measure(build(task), p, xs, label=f"BLOCKED stem+head bf16 b{b}")
    task.netG = task.netG.clone(blocked_stem=False)  # round-1 path
    xs = [jnp.asarray(rng.random((32, 512, 512, 3), dtype=np.float32))
          for _ in range(2)]
    measure(build(task), p, xs, label="unblocked (round-1 path) bf16 b32")
