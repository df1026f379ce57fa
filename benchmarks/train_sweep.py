"""Round-3 training throughput sweep (VERDICT directive 5): 256² batch
sweep b8..b64 post-cadence, plus a 512² point, with train-MFU accounting.

Run on TPU: python benchmarks/train_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_flops_per_image(size: int, pad: int = 10) -> float:
    """Fused GAN step FLOPs/image: G fwd + G bwd (~2x fwd) + D fwd x3
    (fake, real, G-step fake) + D bwd (~2x fwd on the two D-step passes)
    + D-through-G bwd.  Approximation: 3x G fwd + 5x D fwd."""
    from bench import generator_flops_per_tile

    g = generator_flops_per_tile(size, pad)
    # NLayer D (ndf 64, 3 layers) at image size: conv4x4 s2 4→64, 64→128,
    # 128→256, s1 256→512, 512→1
    s = size
    d = 0.0
    cin, cout = 4, 64
    for stride in (2, 2, 2, 1, 1):
        s_out = s // stride
        d += 16 * cin * cout * s_out * s_out
        cin, cout = cout, min(cout * 2, 512)
        if cin == 512:
            cout = 1
        s = s_out
    return 3.0 * g + 5.0 * 2.0 * d


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    rng = np.random.default_rng(0)

    def measure(batch, size, iters=15):
        task = Px2PxTask(cfg)
        state = task.init_state(seed=0, image_size=size)
        step = task.make_train_step()
        ex = task.extract_batch({
            "rgb": rng.random((batch, 3, size, size), np.float32),
            "nir": rng.random((batch, 1, size, size), np.float32)})
        ex = {k: jnp.asarray(v) for k, v in ex.items()}
        state, m = step(state, ex)
        float(jax.device_get(m["model_loss/generator_total_loss"]))
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, ex)
        float(jax.device_get(m["model_loss/generator_total_loss"]))
        dt = (time.perf_counter() - t0) / iters
        ips = batch / dt
        mfu = ips * train_flops_per_image(size) / 197e12
        print(f"{size}² b{batch:<3d}  {1000*dt:7.1f} ms/step  "
              f"{ips:7.1f} img/s/chip  ~{100*mfu:.0f}% MFU")
        del state, ex
        return ips

    for b in (8, 16, 32, 64):
        try:
            measure(b, 256)
        except Exception as e:
            print(f"256² b{b}: failed: {str(e)[:200]}")
    for b in (8, 16):
        try:
            measure(b, 512)
        except Exception as e:
            print(f"512² b{b}: failed: {str(e)[:200]}")


if __name__ == "__main__":
    main()
