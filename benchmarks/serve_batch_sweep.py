"""Serving batch sweep: bf16 vs int8-trunk tiles/s at 512² across batches.

bench.py's headline batch (128) was picked from a bf16 sweep (b64→b128
+10%, b192 OOM — RESULTS.md).  The int8 trunk halves the trunk-activation
footprint, so its memory ceiling sits higher: this sweep checks whether a
larger batch lifts the int8 side-channel past the b128 number.  OOM at a
given batch is recorded and the sweep continues; FAIL rows are tagged by
error class (OOM vs tunnel-transfer vs other) and input buffers are
dropped between attempts so a bf16 OOM can't poison the int8 attempt.

This script has no watchdog of its own: a dead axon tunnel hangs forever
inside setup_runtime, so run it under an external ``timeout 1200 …`` (the
bench.py outage pattern uses a subprocess probe for the same reason).

Run on the TPU: timeout 1200 python benchmarks/serve_batch_sweep.py [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 512
ITERS = 12


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=SIZE)
    params = state.params_g

    batches = [int(a) for a in sys.argv[1:]] or [96, 128, 160, 192]
    rng = np.random.default_rng(0)

    @jax.jit
    def fn(p, x, acc):
        pred = task.g_apply(p, x, train=False)
        return acc + jnp.sum(pred.astype(jnp.float32))

    @jax.jit
    def fn8(p, q, x, acc):
        pred = task.g_apply(p, x, train=False, trunk_q=q)
        return acc + jnp.sum(pred.astype(jnp.float32))

    def timed(f, batch, *extra):
        xs = [jnp.asarray(rng.random((batch, SIZE, SIZE, 3), dtype=np.float32))
              for _ in range(2)]
        acc = f(params, *extra, xs[0], jnp.zeros((), jnp.float32))
        float(acc)  # compile + warm
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for i in range(ITERS):
            acc = f(params, *extra, xs[i % 2], acc)
        checksum = float(acc)
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        return batch * ITERS / dt

    qp = task.build_trunk_q(
        params,
        jnp.asarray(rng.random((8, SIZE, SIZE, 3), dtype=np.float32)).astype(
            task.compute_dtype
        ),
    )

    def error_class(e):
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg:
            return "OOM(RESOURCE_EXHAUSTED)"
        if "INVALID_ARGUMENT" in msg:
            return "transfer(INVALID_ARGUMENT)"
        return type(e).__name__

    import gc

    print(f"{'batch':>6} {'bf16 t/s':>10} {'int8 t/s':>10}", flush=True)
    for b in batches:
        row = [f"{b:>6}"]
        for name, f, extra in (("bf16", fn, ()), ("int8", fn8, (qp,))):
            try:
                row.append(f"{timed(f, b, *extra):>10.1f}")
            except Exception as e:  # OOM or transfer failure: record, move on
                row.append(f"{'FAIL':>10}")
                print(f"  [{name} b{b}] {error_class(e)}: {str(e)[:120]}",
                      file=sys.stderr, flush=True)
            finally:
                # free this attempt's device input buffers (held by the
                # exception frames until collected) so a bf16 OOM leaves no
                # fragmented allocations behind for the int8 attempt
                gc.collect()
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
