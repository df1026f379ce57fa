"""256² training-MFU ceiling ledger (round 3, VERDICT directive 5).

Every phase is measured with CHAINED parameter state (the naive
cumulative-prefix method DCEs the update — see RESULTS.md round-2 note):
each jitted program consumes donated params and returns updated params, so
nothing is dead and each iteration depends on the last.

Phases at 256² b32 bf16 (flagship tile, best sweep batch):
  A. G forward only (serving graph, pad-10)            — FLOPs = F_g
  B. G forward+backward, L1 cotangent, SGD-chained      — FLOPs = 3·F_g
  C. D forward (fake+real pair)                         — FLOPs = 2·F_d
  D. D fwd+bwd on the pair, SGD-chained                 — FLOPs = 6·F_d
  E. full fused production step                         — FLOPs = 3F_g+10F_d

Achieved TFLOP/s per phase vs the 197 TFLOP/s v5e bf16 peak pins where
the training gap lives (conv-grad emitter vs step plumbing).

Run on TPU: python benchmarks/train_ceiling_256.py
"""

import sys
import time

sys.path.insert(0, ".")

PEAK = 197e12
BATCH, SIZE, ITERS = 32, 256, 15


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask
    from bench import generator_flops_per_tile
    from benchmarks.train_sweep import train_flops_per_image

    cfg = load_config("configs/config_px2px.yaml")
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=SIZE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3), np.float32))
    y = jnp.asarray(rng.random((BATCH, SIZE, SIZE, 1), np.float32))

    f_g = generator_flops_per_tile(SIZE, 10) * BATCH
    f_full = train_flops_per_image(SIZE) * BATCH
    # one D forward in FLOPs: f_full = 3·f_g + 5·(one D fwd) — dividing by
    # 10 (the old code) credited MACs, understating phases C/D by 2x
    f_d = (f_full - 3.0 * f_g) / 5.0

    def timed(label, fn, carry, flops):
        carry = fn(carry)  # compile
        jax.tree_util.tree_map(lambda a: a.block_until_ready()
                               if hasattr(a, "block_until_ready") else a, carry)
        # chained-state timing: one pull at the end (axon tunnel semantics)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry = fn(carry)
        leaf = jax.tree_util.tree_leaves(carry)[0]
        float(jnp.sum(leaf.astype(jnp.float32))) if leaf.ndim else float(leaf)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:42s} {1000*dt:8.2f} ms   {flops/dt/1e12:6.1f} TF/s "
              f"({100*flops/dt/PEAK:4.1f}% peak)")
        return dt

    # A. G forward
    @jax.jit
    def g_fwd(p):
        pred = task.g_apply(p, x, train=False)
        # chain: fold a scalar of the output back into one param leaf
        s = jnp.sum(pred.astype(jnp.float32)) * 1e-20
        return jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype), p)

    timed("A  G forward (pad-10 serving graph)", g_fwd, state.params_g, f_g)

    # B. G fwd+bwd (L1), SGD-chained
    @jax.jit
    def g_step(p):
        def loss(pp):
            pred = task.g_apply(pp, x, train=True)
            return jnp.mean(jnp.abs(pred.astype(jnp.float32) - y))
        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, da: a - 1e-9 * da.astype(a.dtype), p, g)

    timed("B  G fwd+bwd (L1, SGD-chained)", g_step, state.params_g, 3 * f_g)

    # C/D. D pair fwd and fwd+bwd
    fake = jnp.concatenate([x, y], axis=-1)

    @jax.jit
    def d_fwd(p):
        out = task.d_apply(p, fake, train=False)
        s = jnp.sum(out.astype(jnp.float32)) * 1e-20
        return jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype), p)

    timed("C  D forward (one 4-ch pair)", d_fwd, state.params_d, f_d)

    @jax.jit
    def d_step(p):
        def loss(pp):
            a = task.d_apply(pp, fake, train=True)
            b = task.d_apply(pp, fake[::-1], train=True)
            return jnp.mean((a.astype(jnp.float32) - 1.0) ** 2) + jnp.mean(
                b.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, da: a - 1e-9 * da.astype(a.dtype), p, g)

    timed("D  D fwd+bwd (2 pairs, SGD-chained)", d_step, state.params_d, 6 * f_d)

    # E. full fused production step
    step = task.make_train_step()
    ex = task.extract_batch({
        "rgb": rng.random((BATCH, 3, SIZE, SIZE), np.float32),
        "nir": rng.random((BATCH, 1, SIZE, SIZE), np.float32)})
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    state2, m = step(state, ex)
    float(jax.device_get(m["model_loss/generator_total_loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state2, m = step(state2, ex)
    float(jax.device_get(m["model_loss/generator_total_loss"]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{'E  full fused production step':42s} {1000*dt:8.2f} ms   "
          f"{f_full/dt/1e12:6.1f} TF/s ({100*f_full/dt/PEAK:4.1f}% peak)")


if __name__ == "__main__":
    main()
