"""In-context breakdown of the fused GAN train step.

Times cumulative prefixes of the real step graph (same technique as
profile_breakdown.py): G forward → +G backward → +D update → full step.
Adjacent-row differences give each phase's in-context cost.  Run on TPU:

    python benchmarks/train_breakdown.py [--batch 8] [--size 256]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nirgan_tpu.config import load_config
    from nirgan_tpu.losses.gan import gan_loss
    from nirgan_tpu.losses.pixel import l1_loss
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=args.size)
    rng = np.random.default_rng(0)
    batch = task.extract_batch({
        "rgb": rng.random((args.batch, 3, args.size, args.size), np.float32),
        "nir": rng.random((args.batch, 1, args.size, args.size), np.float32),
    })
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def g_fwd(st, b):
        rgb = task._dn_to_reflectance(b["rgb"], task.compute_dtype)
        pred, g_vjp, stats_g = jax.vjp(
            lambda pg: task._g_apply(pg, rgb, None, train=True,
                                     stats=st.stats_g, rng=st.rng),
            st.params_g, has_aux=True)
        return rgb, pred, g_vjp

    @jax.jit
    def p1(st, b, acc):  # G forward only
        _, pred, _ = g_fwd(st, b)
        return acc + jnp.sum(pred.astype(jnp.float32))

    @jax.jit
    def p2(st, b, acc):  # G forward + G backward (L1-only cotangent)
        rgb, pred, g_vjp = g_fwd(st, b)
        nir = task._dn_to_reflectance(b["nir"], jnp.float32)
        loss, dpred = jax.value_and_grad(
            lambda p_: l1_loss(p_, nir) * task.lambda_l1)(pred)
        (grads_g,) = g_vjp(dpred.astype(pred.dtype))
        leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(grads_g)]
        return acc + loss + sum(leaves)

    @jax.jit
    def p3(st, b, acc):  # G forward + D update (no G backward)
        rgb, pred, _ = g_fwd(st, b)
        nir = task._dn_to_reflectance(b["nir"], jnp.float32)
        pred_sg = jax.lax.stop_gradient(pred)

        def d_loss_fn(params_d):
            fake_ab = jnp.concatenate([rgb, pred_sg], axis=-1)
            real_ab = jnp.concatenate([rgb, nir.astype(rgb.dtype)], axis=-1)
            lf, st1 = task._d_apply(params_d, fake_ab, train=True, stats=st.stats_d)
            lr_, _ = task._d_apply(params_d, real_ab, train=True, stats=st1)
            return gan_loss(lf, False, task.gan_mode) + gan_loss(lr_, True, task.gan_mode)

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(st.params_d)
        leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(grads_d)]
        return acc + loss_d + sum(leaves)

    full = task.make_train_step()

    @jax.jit
    def p4(st, b, acc):  # full production step
        st2, metrics = full(st, b)
        return acc + metrics["model_loss/generator_total_loss"]

    def measure(fn, label, st):
        acc = jnp.zeros((), jnp.float32)
        acc = fn(st, batch, acc)
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(st, batch, acc)
        float(acc)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:38s} {1000*dt:7.2f} ms")
        return dt

    t1 = measure(p1, "G forward", state)
    t2 = measure(p2, "G forward + G backward(L1)", state)
    t3 = measure(p3, "G forward + D update grads", state)
    t4 = measure(p4, "full fused step", state)
    print(f"\nΔ G backward      ≈ {1000*(t2-t1):6.2f} ms")
    print(f"Δ D-update part   ≈ {1000*(t3-t1):6.2f} ms")
    print(f"Δ rest (G-upd via D, optimizers, metrics) ≈ {1000*(t4-t2-(t3-t1)):6.2f} ms")


if __name__ == "__main__":
    main()
