"""A/B: threaded device-feed prefetch (tpu.prefetch_depth) vs inline feed.

Through the axon tunnel training is upload-bound (RESULTS.md ingest line):
the per-step host work — batch assembly + the *blocking* part of the
host→device transfer — serialises with compute in the inline feed.  The
producer-thread feed (data/pipeline.py DeviceFeed depth>=1) overlaps it.
On real TPU hosts with PCIe ingest the two should tie (dispatch-async
device_put already overlaps); the knob targets thin links.

Run on the TPU: python benchmarks/prefetch_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import numpy as np

    from nirgan_tpu.config import load_config
    from nirgan_tpu.data import dataset_selector
    from nirgan_tpu.data.pipeline import DeviceFeed
    from nirgan_tpu.parallel import create_mesh, shard_batch
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
    cfg.Data.fake_settings.image_size = 256
    # one epoch must outlast warm-up + the 24-step window (b32 → 28 batches)
    cfg.Data.fake_settings.length = 896
    cfg.Data.train_batch_size = 32
    cfg.Data.num_workers = 4
    # --f16: the production thin-link config (tpu.transfer_dtype) — halves
    # every upload.  NB it does NOT rescue this A/B on the 1-core container
    # host (measured 2026-08-20: all windows still die INVALID_ARGUMENT with
    # 7 retry attempts) — the root cause is loader worker threads starving
    # the tunnel client of CPU, not transfer size (RESULTS.md round 4,
    # "INVALID_ARGUMENT transfer failures, root-caused").  The flag is for
    # real multi-core hosts with thin links.
    if "--f16" in sys.argv:
        cfg.tpu.transfer_dtype = "float16"
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    mesh = create_mesh(("data",))
    state = task.init_state(seed=0, image_size=256)
    from nirgan_tpu.parallel import replicate

    state = replicate(mesh, state)
    step = task.make_train_step(mesh)

    prepare = lambda b: shard_batch(mesh, task.extract_batch(b))

    def run(depth, steps=24):
        nonlocal state
        feed = DeviceFeed(dm.train_dataloader(), prepare, depth=depth,
                          transfer_retries=6)
        it = iter(feed)
        s, _ = step(state, next(it))  # compile/warm outside the window
        jax.device_get(s.step)
        n = 0
        t0 = time.perf_counter()
        for ex in it:
            state, m = step(state, ex)
            n += 1
            # production pacing: the trainer pulls metrics every 10th step
            # (tpu.train_metrics_every).  Without ANY host sync the loop
            # dispatches 25 MB uploads at ~5/s against the tunnel's
            # ~57 MB/s — the unbounded async backlog is what produced the
            # INVALID_ARGUMENT failures (RESULTS.md round 4), not a flaky
            # tunnel.  This barrier mirrors the real training loop.
            if n % 10 == 0:
                float(m["model_loss/generator_total_loss"])
            if n >= steps:
                break
        jax.device_get(state.step)  # barrier through the tunnel
        dt = time.perf_counter() - t0
        return 32 * n / dt

    for depth in (0, 2, 0, 2):  # interleave to cancel drift
        # the axon tunnel intermittently fails transfers under sustained
        # upload load (RESULTS.md round 4); DeviceFeed retries transients,
        # but if a window still dies, record it and keep the other windows
        try:
            ips = run(depth)
            print(f"depth={depth}: {ips:7.1f} img/s", flush=True)
        except Exception as e:
            print(f"depth={depth}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
