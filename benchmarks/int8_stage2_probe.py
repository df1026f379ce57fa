"""Stage-2 int8 probe: do the non-trunk serving convs also win in int8?

The shipped int8 mode covers the residual trunk (77% of FLOPs, measured
1.62×).  The remaining MXU-heavy convs each follow an affine-free IN, so
the same accumulator-unit formulation applies *if* the int8 MXU path
engages for their shapes:

  * d1: 3×3 stride-2 128→256 at 266² (the largest single non-trunk conv)
  * u0: 3×3 stride-2 *transposed* 256→128 at 133² (lhs-dilated conv — the
    open question is whether XLA's int8 double-rate path works with
    lhs_dilation)
  * d0: excluded (fused into the blocked stem pipeline)

Run on the TPU: python benchmarks/int8_stage2_probe.py
Decision rule: implement the stage-2 mode only for shapes where int8 beats
bf16 by >1.2× here (quantise/requant overhead eats anything less in
context — trunk experience, RESULTS.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = 32
    rng = np.random.default_rng(0)

    def timed(fn, args, iters=12):
        acc = fn(*args, jnp.zeros((), jnp.float32))
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fn(*args, acc)
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / iters

    def report(name, dt_b, dt_i, flops):
        print(f"{name}: bf16 {dt_b*1e3:6.2f} ms ({flops/dt_b/1e12:5.1f} TF/s)"
              f" | int8 {dt_i*1e3:6.2f} ms | speedup {dt_b/dt_i:.2f}x",
              flush=True)

    # ---- d1: 3x3 stride-2 conv, 128→256 @ 266² -------------------------
    H = 266
    x = jnp.asarray(rng.random((B, H, H, 128), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.random((3, 3, 128, 256), np.float32), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, H, 128)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, 128, 256)), jnp.int8)

    @jax.jit
    def d1_bf16(x, w, acc):
        y = lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.float32)
        return acc + jnp.sum(y).astype(jnp.float32)

    @jax.jit
    def d1_int8(x, w, acc):
        y = lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.int32)
        return acc + jnp.sum(y.astype(jnp.float32))

    flops = 2 * 9 * 128 * 256 * (H // 2) ** 2 * B
    report("d1 3x3/s2 128→256 @266²", timed(d1_bf16, (x, w)),
           timed(d1_int8, (x8, w8)), flops)

    # ---- u0: 3x3 stride-2 transposed conv, 256→128 @133² ---------------
    H = 133
    x = jnp.asarray(rng.random((B, H, H, 256), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.random((3, 3, 256, 128), np.float32), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, H, 256)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, 256, 128)), jnp.int8)

    def convT(x, w, ptype):
        # lhs-dilated conv == ConvTranspose(stride 2, k3, pad 1, outpad 1)
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    @jax.jit
    def u0_bf16(x, w, acc):
        return acc + jnp.sum(convT(x, w, jnp.float32)).astype(jnp.float32)

    @jax.jit
    def u0_int8(x, w, acc):
        return acc + jnp.sum(convT(x, w, jnp.int32).astype(jnp.float32))

    flops = 2 * 9 * 256 * 128 * H * H * B  # MACs = k²·Cin·Cout·Hin·Win
    report("u0 3x3 convT 256→128 @133²", timed(u0_bf16, (x, w)),
           timed(u0_int8, (x8, w8)), flops)

    # ---- blocked stem: 7×7 s2d-folded conv, 12→64 @266² ----------------
    # (ops/blocked_stem.py folds the 532² 3-ch stem into 2×2 blocks; the
    # channel-starved question: does int8 help an MXU-starved conv at all?)
    H = 266
    x = jnp.asarray(rng.random((B, H, H, 12), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.random((4, 4, 12, 64), np.float32), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, H, 12)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (4, 4, 12, 64)), jnp.int8)

    @jax.jit
    def stem_bf16(x, w, acc):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.float32)
        return acc + jnp.sum(y).astype(jnp.float32)

    @jax.jit
    def stem_int8(x, w, acc):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.int32)
        return acc + jnp.sum(y.astype(jnp.float32))

    flops = 2 * 16 * 12 * 64 * H * H * B
    report("stem s2d 4x4 12→64 @266²", timed(stem_bf16, (x, w)),
           timed(stem_int8, (x8, w8)), flops)

    # ---- UNet hot shapes (VERDICT r3 item 6): the outermost stride-2
    # convs dominate unet_256 serving FLOPs; all are 4×4 s2 zero-pad-1.
    for cin, cout, h in ((64, 128, 128), (128, 256, 64), (3, 64, 256)):
        x = jnp.asarray(rng.random((B, h, h, cin), np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.random((4, 4, cin, cout), np.float32), jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, (B, h, h, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (4, 4, cin, cout)), jnp.int8)

        @jax.jit
        def un_bf16(x, w, acc):
            y = lax.conv_general_dilated(
                x, w, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return acc + jnp.sum(y).astype(jnp.float32)

        @jax.jit
        def un_int8(x, w, acc):
            y = lax.conv_general_dilated(
                x, w, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return acc + jnp.sum(y.astype(jnp.float32))

        flops = 2 * 16 * cin * cout * (h // 2) ** 2 * B
        report(f"unet 4x4/s2 {cin}→{cout} @{h}²", timed(un_bf16, (x, w)),
               timed(un_int8, (x8, w8)), flops)


if __name__ == "__main__":
    main()
