"""In-context A/B: int8 serving trunk vs production bf16, full g_apply path.

The block probe (int8_block_probe.py) measured 1.62x on the isolated trunk;
this runs the REAL serving forward (flagship plain config, reflect-pad-10,
blocked stem/head) with and without `trunk_q` at the bench shapes, plus the
output PSNR between the two paths (the quality cost of the mode).

Run on the TPU: python benchmarks/int8_serving_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import V5E_BF16_PEAK, generator_flops_per_tile  # noqa: E402


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=512)
    params = state.params_g
    SIZE = 512
    flops = generator_flops_per_tile(SIZE)

    def timed(fn, args0, xs, acc0, iters, batch):
        acc = fn(*args0, xs[0], acc0)
        float(acc)  # compile + warm
        acc = acc0
        t0 = time.perf_counter()
        for i in range(iters):
            acc = fn(*args0, xs[i % len(xs)], acc)
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / iters
        return dt, batch / dt

    rng = np.random.default_rng(0)
    for batch, iters in ((32, 16), (128, 8)):
        xs = [jnp.asarray(rng.random((batch, SIZE, SIZE, 3), dtype=np.float32))
              for _ in range(2)]

        @jax.jit
        def f_bf16(p, x, acc):
            pred = task.g_apply(p, x.astype(task.compute_dtype), train=False)
            return acc + jnp.sum(pred.astype(jnp.float32))

        qp = task.build_trunk_q(params, xs[0].astype(task.compute_dtype))

        @jax.jit
        def f_int8(p, q, x, acc):
            pred = task.g_apply(p, x.astype(task.compute_dtype), train=False,
                                trunk_q=q)
            return acc + jnp.sum(pred.astype(jnp.float32))

        z = jnp.zeros((), jnp.float32)
        dt_b, tps_b = timed(f_bf16, (params,), xs, z, iters, batch)
        dt_i, tps_i = timed(f_int8, (params, qp), xs, z, iters, batch)
        print(f"b{batch}: bf16 {dt_b*1e3:7.1f} ms  {tps_b:6.1f} t/s "
              f"({tps_b*flops/V5E_BF16_PEAK*100:.0f}% bf16-peak) | "
              f"int8 {dt_i*1e3:7.1f} ms  {tps_i:6.1f} t/s "
              f"({tps_i*flops/V5E_BF16_PEAK*100:.0f}%-of-bf16-peak) | "
              f"speedup {dt_b/dt_i:.2f}x")

    # quality: PSNR between the two paths on one batch (random-init params;
    # tests/test_int8_trunk.py guards this bound in the suite)
    x = jnp.asarray(rng.random((8, SIZE, SIZE, 3), dtype=np.float32))
    pb = np.asarray(jax.jit(lambda p, x: task.g_apply(
        p, x.astype(task.compute_dtype), train=False).astype(jnp.float32))(params, x))
    pi = np.asarray(jax.jit(lambda p, q, x: task.g_apply(
        p, x.astype(task.compute_dtype), train=False, trunk_q=q).astype(jnp.float32))(
        params, qp, x))
    mse = np.mean((pb - pi) ** 2)
    print(f"int8-vs-bf16 output PSNR (range 2): {10*np.log10(4.0/mse):.1f} dB")


if __name__ == "__main__":
    main()
