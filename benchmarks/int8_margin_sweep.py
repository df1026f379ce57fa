"""Calibration-margin sweep for the int8 serving trunk.

Single-batch per-channel absmax calibration needs headroom for unseen
activations; too much headroom wastes the uniform int8 grid.  This sweeps
``calibrate_trunk``'s margin and reports end-to-end generator PSNR (int8 vs
float path) on the calibration batch and on unseen batches — the basis for
the shipped default (ops/int8_trunk.py).  Dtype-independent (quantisation
error dominates), so CPU f32 numbers transfer to TPU bf16 serving:

    python benchmarks/int8_margin_sweep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # quantisation error dominates and is dtype-independent — run on CPU
    # unless explicitly pointed at the chip (probing the default backend
    # would block on a down axon tunnel)
    if os.environ.get("NIRGAN_SWEEP_TPU", "0") != "1":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nirgan_tpu.models.generator import ResnetGenerator
    from nirgan_tpu.ops.int8_trunk import calibrate_trunk, quantize_trunk

    g = ResnetGenerator(input_nc=3, output_nc=1, ngf=32, n_blocks=9,
                        compute_dtype=jnp.float32)
    x_cal = jax.random.uniform(jax.random.PRNGKey(1), (2, 84, 84, 3),
                               jnp.float32) * 0.3
    params = g.init(jax.random.PRNGKey(0), x_cal)["params"]
    unseen = [jax.random.uniform(jax.random.PRNGKey(k), (2, 84, 84, 3),
                                 jnp.float32) * 0.3 for k in (7, 11, 13)]

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)) ** 2))
        return 10 * np.log10(4.0 / mse)

    apply_f = jax.jit(lambda p, x: g.apply({"params": p}, x, train=False))
    # trunk_q is an argument, so ONE compile serves every margin
    apply_q = jax.jit(lambda p, x, q: g.apply({"params": p}, x, train=False,
                                              trunk_q=q))
    ref = {None: apply_f(params, x_cal)}
    for i, xu in enumerate(unseen):
        ref[i] = apply_f(params, xu)

    print("margin | PSNR cal-batch | PSNR unseen (mean of 3)", flush=True)
    for margin in (1.02, 1.1, 1.2, 1.35, 1.5, 2.0):
        calib = calibrate_trunk(g, params, x_cal, margin=margin)
        qp = quantize_trunk(params, 9, calib)
        p_cal = psnr(apply_q(params, x_cal, qp), ref[None])
        p_uns = np.mean([psnr(apply_q(params, xu, qp), ref[i])
                         for i, xu in enumerate(unseen)])
        print(f"{margin:6.2f} | {p_cal:13.1f} | {p_uns:10.1f}", flush=True)


if __name__ == "__main__":
    main()
