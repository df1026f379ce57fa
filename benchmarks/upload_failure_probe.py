"""Characterise the axon tunnel's host→device upload failure mode.

Three patterns, same total bytes (N × 12.5 MB f16 batches):
  A. sequential device_put, device idle (no heavy compute in flight; each
     upload is chained into a tiny checksum so the transferred bytes are
     actually consumed — a device_put that fails lazily at consumption
     would otherwise count "ok")
  B. device_put interleaved with an in-flight jitted step (production
     training shape: upload batch k+1 while step k executes)
  C. chunked upload (4 pieces per batch, device-side concat) interleaved
     with compute — does splitting the transfer dodge the failure?

Each transfer records ok/INVALID_ARGUMENT; the summary table separates
"uploads are broken today" from "uploads fail only under compute overlap"
(RESULTS.md round-4: sustained-upload INVALID_ARGUMENT failures killed the
prefetch A/B twice).

Run on the TPU: python benchmarks/upload_failure_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 24
SHAPE = (32, 256, 256, 3)  # b32 256² — the prefetch A/B batch


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    host = [rng.random(SHAPE).astype(np.float16) for _ in range(2)]

    @jax.jit
    def burn(x, acc):
        # ~trunk-block-sized compute to keep the device busy during uploads
        y = x.astype(jnp.bfloat16)
        for _ in range(8):
            y = jnp.tanh(y @ jnp.swapaxes(y, -1, -2) @ y[..., :3])
        return acc + jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def consume(x, acc):
        # cheap full-tensor checksum: validates the transferred bytes
        # without keeping the device busy (trial A must stay ~idle)
        return acc + jnp.sum(x.astype(jnp.float32))

    def trial(name, interleave, chunks=1):
        ok = fail = 0
        acc = jnp.zeros((), jnp.float32)
        dev = jax.device_put(host[0])
        float(burn(dev, acc))  # compile outside the window
        float(consume(dev, acc))
        t0 = time.perf_counter()
        for i in range(N):
            if interleave:
                acc = burn(dev, acc)  # async: device busy while we upload
            try:
                if chunks == 1:
                    dev = jax.device_put(host[i % 2])
                else:
                    parts = np.array_split(host[i % 2], chunks, axis=0)
                    dev = jnp.concatenate([jax.device_put(p) for p in parts])
                if not interleave:
                    acc = consume(dev, acc)  # chained; pulled once at the end
                ok += 1
            except Exception as e:
                fail += 1
                if fail <= 2:
                    print(f"  [{name} #{i}] {type(e).__name__}: "
                          f"{str(e)[:100]}", file=sys.stderr, flush=True)
                time.sleep(1.0)
        try:
            checksum = float(acc)  # surfaces lazily-failed transfers
            assert np.isfinite(checksum)
        except Exception as e:
            print(f"  [{name}] checksum pull failed: {type(e).__name__}: "
                  f"{str(e)[:100]}", file=sys.stderr, flush=True)
        dt = time.perf_counter() - t0
        print(f"{name:<28} ok={ok:3d} fail={fail:3d}  {dt:6.1f}s", flush=True)

    trial("A sequential, idle device", interleave=False)
    trial("B overlapped with compute", interleave=True)
    trial("C overlapped, 4-way chunks", interleave=True, chunks=4)

    # D/E: the prefetch A/B's actual upload is COMMITTED-sharded
    # (shard_batch → device_put(x, NamedSharding)); E is the candidate
    # workaround — plain upload, then an on-device commit (no host bytes).
    from nirgan_tpu.parallel import batch_sharding, create_mesh

    mesh = create_mesh(("data",))
    s = batch_sharding(mesh, "data")
    s_rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def trial_sharded(name, two_stage):
        ok = fail = 0
        # acc committed-replicated on the same mesh as dev: mixing a
        # committed-sharded array with an uncommitted scalar in one jitted
        # call falls off the tunnel's fast dispatch path (RESULTS.md r4)
        acc = jax.device_put(jnp.zeros((), jnp.float32), s_rep)
        dev = jax.device_put(host[0], s)
        float(burn(dev, acc))
        t0 = time.perf_counter()
        for i in range(N):
            acc = burn(dev, acc)
            try:
                if two_stage:
                    dev = jax.device_put(jax.device_put(host[i % 2]), s)
                else:
                    dev = jax.device_put(host[i % 2], s)
                ok += 1
            except Exception as e:
                fail += 1
                if fail <= 2:
                    print(f"  [{name} #{i}] {type(e).__name__}: "
                          f"{str(e)[:100]}", file=sys.stderr, flush=True)
                time.sleep(1.0)
        try:
            float(acc)
        except Exception:
            pass
        dt = time.perf_counter() - t0
        print(f"{name:<28} ok={ok:3d} fail={fail:3d}  {dt:6.1f}s", flush=True)

    trial_sharded("D sharded put, overlapped", two_stage=False)
    trial_sharded("E plain put + dev commit", two_stage=True)


if __name__ == "__main__":
    main()
