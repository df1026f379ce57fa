"""Train-step cost ledger, part 2 — state-CHAINED timings (part 1's
cumulative prefixes DCE'd the parameter updates when only a metric was
pulled; chaining the donated state forces the full update every iteration).

Variants: production step / metrics stubbed out / legacy-style every-10th
metrics would sit between.  Run on TPU:
    python benchmarks/train_breakdown2.py [--batch 8] [--size 256]
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
    from nirgan_tpu.tasks import Px2PxTask
    import nirgan_tpu.tasks.px2px as px

    cfg = load_config("configs/config_px2px.yaml")
    rng = np.random.default_rng(0)

    def run(label, stub_metrics):
        real = px.calculate_metrics
        if stub_metrics:
            px.calculate_metrics = lambda *a, **k: {}
        try:
            task = Px2PxTask(cfg)
            state = task.init_state(seed=0, image_size=args.size)
            step = task.make_train_step()
            batch = task.extract_batch({
                "rgb": rng.random((args.batch, 3, args.size, args.size), np.float32),
                "nir": rng.random((args.batch, 1, args.size, args.size), np.float32),
            })
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step(state, batch)
            float(jax.device_get(m["model_loss/generator_total_loss"]))  # compile
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = step(state, batch)
            float(jax.device_get(m["model_loss/generator_total_loss"]))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{label:44s} {1000*dt:7.2f} ms/step")
            return dt
        finally:
            px.calculate_metrics = real

    t_full = run("production step (chained, donated)", False)
    t_nom = run("step with train metrics stubbed", True)
    print(f"\nper-step cost of train L1/L2/PSNR/SSIM metrics ≈ "
          f"{1000*(t_full-t_nom):.2f} ms "
          f"(reference computes them every 10th batch only)")


if __name__ == "__main__":
    main()
