"""Steady-state throughput of the whole-scene serving path
(nirgan_tpu/inference/scene.py) on the real chip.

Two numbers per mode (bf16 / int8 trunk):
  * end-to-end windows/s over a 4096² uint16 scene (100 × 512² windows at
    overlap 32, batch 8) — includes host window-cutting, the host→device
    transfer (12.6 MB/batch; through the axon tunnel this dominates), and
    host blending overlapped with compute;
  * compute-only windows/s — the same fused program re-dispatched on one
    resident device batch, chained via a scalar checksum (the tunnel-safe
    timing pattern, see bench.py), which is what a production PCIe host
    would see from the device side.

Run on the TPU: python benchmarks/scene_bench.py
Host-side cut/blend A/B (no TPU; C++ threads vs numpy loops):
    python benchmarks/scene_bench.py --host-ab
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_ab():
    """Host-only share of the scene pipeline: window cutting + plateau
    blending over a 4096² scene, native (tileio.cc threads) vs the numpy
    loops they replaced.  Forces CPU BOTH ways (env var AND jax.config —
    the sitecustomize has already snapshotted JAX_PLATFORMS=axon by the
    time this runs, so the env var alone is ineffective; CLAUDE.md) so no
    code path here can ever touch the tunnel."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nirgan_tpu.data import native_loader
    from nirgan_tpu.inference.scene import plateau_weight, tile_origins

    rng = np.random.default_rng(0)
    TILE, OV, BS = 512, 32, 8
    H = 4096
    scene = rng.integers(0, 10000, size=(3, H, H)).astype(np.uint16)
    pad = np.ascontiguousarray(np.pad(scene, ((0, 0), (OV, OV), (OV, OV)),
                                      mode="reflect"))
    S = TILE - 2 * OV
    ys = tile_origins(pad.shape[1], TILE, S)
    wins = np.asarray([(y, x) for y in ys for x in ys], np.int32)
    preds = rng.random((BS, TILE, TILE)).astype(np.float32)
    w1 = plateau_weight(TILE, OV)
    w2d = np.outer(w1, w1)

    for native in (True, False) if native_loader.available() else (False,):
        num = np.zeros(pad.shape[1:], np.float32)
        den = np.zeros(pad.shape[1:], np.float32)
        t_cut = t_blend = 0.0
        for i in range(0, len(wins), BS):
            bw = wins[i:i + BS]
            t0 = time.perf_counter()
            if native:
                tiles = native_loader.scene_cut(pad, bw, TILE)
            else:
                # materialise the NHWC copy — the real pipeline pays it at
                # jnp.asarray (np.transpose alone is a lazy view)
                tiles = np.ascontiguousarray(np.transpose(
                    np.stack([pad[:, y:y + TILE, x:x + TILE]
                              for y, x in bw]), (0, 2, 3, 1)))
            t_cut += time.perf_counter() - t0
            p = preds[:len(bw)]
            t0 = time.perf_counter()
            if native:
                native_loader.scene_blend(num, den, p, bw, TILE, w1)
            else:
                for pr, (y, x) in zip(p, bw):
                    num[y:y + TILE, x:x + TILE] += pr * w2d
                    den[y:y + TILE, x:x + TILE] += w2d
            t_blend += time.perf_counter() - t0
            _ = tiles
        n = len(wins)
        print(f"native={str(native):5s} cut {t_cut / n * 1e3:6.2f} ms/win  "
              f"blend {t_blend / n * 1e3:6.2f} ms/win  "
              f"host-only {n / (t_cut + t_blend):6.1f} win/s", flush=True)


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nirgan_tpu.config import load_config
    from nirgan_tpu.inference.scene import synthesize_scene
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 10000, size=(3, 4096, 4096)).astype(np.uint16)
    TILE, OV, BS = 512, 32, 8

    for quant in ("none", "int8"):
        cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
        cfg.tpu.serving_quant = quant
        task = Px2PxTask(cfg)
        task.bind(task.init_state(seed=0, image_size=64))

        # warm the compile (+ int8 calibration) outside the window
        synthesize_scene(task, scene[:, :1024, :1024], tile=TILE, overlap=OV,
                         batch_size=BS)

        t0 = time.perf_counter()
        out = synthesize_scene(task, scene, tile=TILE, overlap=OV,
                               batch_size=BS)
        dt = time.perf_counter() - t0
        from nirgan_tpu.inference.scene import tile_origins
        n_side = len(tile_origins(4096 + 2 * OV, TILE, TILE - 2 * OV))
        n_win = n_side * n_side
        e2e = n_win / dt
        assert np.isfinite(out).all()

        # compute-only: one resident batch, chained through an accumulator
        # ARG (bench.py pattern).  The previous form chained via an f32
        # bias ADDED TO THE INPUT (+ an eager s*1e-9 between dispatches),
        # which alone cost 40% (216 → 128 t/s bisected round 5: the f32
        # promotion rides the pad into the stem and the eager scalar adds
        # a dispatch per iteration) — a harness artifact, not serving cost.
        tiles = jnp.asarray(
            rng.integers(0, 10000, size=(BS, TILE, TILE, 3)).astype(np.uint16))

        def step(params, stats, x, tq, acc):
            y = task.g_apply(params,
                             task._dn_to_reflectance(x, task.compute_dtype),
                             None, train=False, stats=stats, trunk_q=tq)
            return acc + jnp.sum(y.astype(jnp.float32))

        fn = jax.jit(step)
        acc = fn(task._params_g, task._stats_g, tiles, task._trunk_q,
                 jnp.zeros((), jnp.float32))
        float(acc)  # compile + settle
        acc = jnp.zeros((), jnp.float32)
        N = 12
        t0 = time.perf_counter()
        for _ in range(N):
            acc = fn(task._params_g, task._stats_g, tiles, task._trunk_q, acc)
        cs = float(acc)
        dt_c = time.perf_counter() - t0
        comp = N * BS / dt_c
        print(f"quant={quant}: end-to-end {e2e:6.1f} win/s "
              f"({n_win} x {TILE}² windows, {dt:5.1f}s) | "
              f"compute-only {comp:6.1f} win/s (checksum {cs:.3e})",
              flush=True)


if __name__ == "__main__":
    if "--host-ab" in sys.argv:
        host_ab()
    else:
        main()
