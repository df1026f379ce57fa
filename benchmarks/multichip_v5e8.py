"""First-real-multichip-session runner (see multichip_plan.md).

This container has one tunnelled v5e chip, so the multi-chip paths have only
ever run on virtual CPU meshes; this script is what the FIRST session on a
real v5e-8 (or any n>=2 slice) runs, in order, before any other work:

  ici      psum all-reduce microbench over the data axis (mis-cabling gate)
  ckpt     1-chip-saved train state restores onto the full mesh
  train    fused GAN train-step weak scaling (1 chip vs full mesh)
  serve    512^2 serving scaling across mesh shapes (8,1)/(4,2)/(2,4),
           bf16 and int8-trunk, plus one giant-tile H-sharded point
  serve2d  numerics: 2-D mesh forward == single-chip forward

Usage:
  python benchmarks/multichip_v5e8.py                 # all steps, real slice
  python benchmarks/multichip_v5e8.py ici train       # subset
  python benchmarks/multichip_v5e8.py --smoke         # 8-virtual-CPU rehearsal

--smoke forces the CPU platform (per CLAUDE.md: never probe the backend to
decide — a dead axon tunnel hangs inside init) with 8 virtual devices and
tiny shapes; it validates the script end-to-end so real-hardware time is
spent measuring, not debugging.  Results land in
benchmarks/multichip_results.json and one JSON line per step on stdout.
"""

import json
import os
import sys
import time

SMOKE = "--smoke" in sys.argv
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    os.environ["XLA_FLAGS"] = " ".join(flags)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# smoke rehearsals write their own file so they can never clobber a
# real-hardware record
OUT = os.path.join(REPO, "benchmarks",
                   "multichip_results_smoke.json" if SMOKE
                   else "multichip_results.json")
RESULTS = []


def emit(step, **kw):
    rec = {"step": step, **kw}
    print(json.dumps(rec), flush=True)
    RESULTS.append(rec)


def _setup():
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from nirgan_tpu.runtime import setup_runtime

        setup_runtime()
    import jax

    return jax


def _flagship_task(image_size, config="configs/config_px2px_SatCLIP.yaml",
                   dtype=None):
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config(os.path.join(REPO, config))
    cfg.tpu.compute_dtype = dtype or ("float32" if SMOKE else "bfloat16")
    cfg.Data.fake_settings.image_size = image_size
    if SMOKE:
        # rehearsal validates the script paths, not perf: a tiny net keeps
        # the single-core CPU compiles (2 meshes × train + 3 mesh shapes ×
        # 2 quant modes × serve) under a minute each instead of ~10
        cfg.base_configs.ngf = 8
        cfg.base_configs.ndf = 8
        cfg.base_configs.netG = "resnet_6blocks"
    return Px2PxTask(cfg)


def step_ici(jax):
    """psum all-reduce microbench — the mis-cabling gate (plan section 2)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nirgan_tpu.parallel import create_mesh

    n = jax.device_count()
    mesh = create_mesh(("data",), devices=jax.devices()[:n])
    mb = 1 if SMOKE else 64
    x = np.ones((n, mb * 1024 * 1024 // 4), np.float32)
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def allreduce_sum(x, acc):
        y = jax.shard_map(
            lambda s: jax.lax.psum(s, "data"), mesh=mesh,
            in_specs=P("data"), out_specs=P("data"))(x)
        return acc + y[0, 0]

    acc = allreduce_sum(xd, jnp.zeros((), np.float32))
    float(acc)  # compile barrier
    iters = 4 if SMOKE else 20
    acc = jnp.zeros((), np.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = allreduce_sum(xd, acc)
    assert np.isfinite(float(acc))
    dt = (time.perf_counter() - t0) / iters
    # ring all-reduce: each chip moves 2*(N-1)/N * bytes over ICI
    bytes_per_chip = 2 * (n - 1) / n * mb * 1024 * 1024
    gbps = bytes_per_chip / dt / 1e9
    emit("ici", devices=n, payload_mb=mb, ms=round(dt * 1e3, 3),
         effective_gbps_per_chip=round(gbps, 1),
         pass_bar=">=100 GB/s on real v5e ICI (n/a in smoke)")


def step_ckpt(jax):
    """1-chip state restores onto the full mesh (plan section 1)."""
    import tempfile

    from nirgan_tpu.parallel import create_mesh, replicate, shard_batch
    from nirgan_tpu.train.checkpoint import CheckpointManager

    size = 32 if SMOKE else 256
    n = jax.device_count()
    task = _flagship_task(size)
    rng = np.random.default_rng(0)

    def batch(bs):
        return {"rgb": rng.random((bs, 3, size, size), np.float32),
                "nir": rng.random((bs, 1, size, size), np.float32),
                "coords": rng.uniform(-90, 90, (bs, 2)).astype(np.float32)}

    with tempfile.TemporaryDirectory() as td:
        mesh1 = create_mesh(("data",), devices=jax.devices()[:1])
        state = replicate(mesh1, task.init_state(seed=0, image_size=size))
        step1 = task.make_train_step(mesh=mesh1)
        b = batch(2)
        state, m1 = step1(state, shard_batch(mesh1, task.extract_batch(b)))
        mgr = CheckpointManager(td)
        mgr.save(jax.device_get(state), {"val/L1": 1.0})

        meshN = create_mesh(("data",), devices=jax.devices()[:n])
        stateN = replicate(meshN, task.init_state(seed=1, image_size=size))
        restored = mgr.restore(jax.device_get(stateN), which="last")
        stateN = replicate(meshN, restored)
        stepN = task.make_train_step(mesh=meshN)
        bN = batch(n)
        _, mN = stepN(stateN, shard_batch(meshN, task.extract_batch(bN)))
    l1, lN = (float(m1["model_loss/generator_total_loss"]),
              float(mN["model_loss/generator_total_loss"]))
    assert np.isfinite(l1) and np.isfinite(lN)
    emit("ckpt", devices=n, loss_1chip_step2_ok=True,
         loss_restored=round(lN, 5),
         note="1-chip ckpt -> full-mesh restore, second step finite")


def step_train(jax):
    """Fused train-step weak scaling: per-chip batch fixed (plan section 3)."""
    from nirgan_tpu.parallel import create_mesh, replicate, shard_batch

    size = 32 if SMOKE else 256
    per_chip = 2 if SMOKE else 32
    iters = 3 if SMOKE else 12
    rng = np.random.default_rng(0)
    rates = {}
    for n in {1, jax.device_count()}:
        task = _flagship_task(size)
        mesh = create_mesh(("data",), devices=jax.devices()[:n])
        state = replicate(mesh, task.init_state(seed=0, image_size=size))
        step = task.make_train_step(mesh=mesh)
        bs = per_chip * n
        b = {"rgb": rng.random((bs, 3, size, size), np.float32),
             "nir": rng.random((bs, 1, size, size), np.float32),
             "coords": rng.uniform(-90, 90, (bs, 2)).astype(np.float32)}
        ex = shard_batch(mesh, task.extract_batch(b))
        state, m = step(state, ex)  # compile
        float(m["model_loss/generator_total_loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, ex)
        float(m["model_loss/generator_total_loss"])  # single sync
        dt = (time.perf_counter() - t0) / iters
        rates[n] = bs / dt
        emit("train", devices=n, img_per_s=round(rates[n], 1),
             img_per_s_per_chip=round(rates[n] / n, 1),
             step_ms=round(dt * 1e3, 1))
    n = jax.device_count()
    if n > 1:
        eff = rates[n] / (rates[1] * n)
        emit("train_scaling", devices=n, efficiency=round(eff, 3),
             pass_bar=">=0.90 on real ICI (n/a in smoke)")


def step_serve(jax):
    """512^2 serving scaling across mesh shapes, bf16 + int8 (plan 4/5)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nirgan_tpu.parallel import create_mesh
    from nirgan_tpu.parallel.spatial import spatial_predict_fn_2d

    size = 64 if SMOKE else 512
    n = jax.device_count()
    per_chip = 2 if SMOKE else 16
    iters = 2 if SMOKE else 8
    task = _flagship_task(size, config="configs/config_px2px.yaml")
    state = task.init_state(seed=0, image_size=size)
    params = jax.device_get(state.params_g)
    rng = np.random.default_rng(0)

    shapes = [(n, 1)]
    if n % 2 == 0 and n >= 4:
        shapes += [(n // 2, 2), (n // 4, 4) if n >= 8 else None]
    shapes = [s for s in shapes if s]

    for quant in (None, "int8"):
        qp = None
        if quant:
            try:
                calib = jnp.asarray(
                    rng.random((4, size, size, 3), np.float32))
                qp = task.build_trunk_q(params, calib.astype(task.compute_dtype))
            except Exception as e:
                emit("serve", quant="int8", skipped=str(e))
                continue
        for (nb, nh) in shapes:
            mesh = create_mesh(("data", "spatial"),
                               devices=jax.devices()[:n], shape=(nb, nh))
            _, grid = spatial_predict_fn_2d(task, mesh)
            repl = NamedSharding(mesh, P())
            bs = per_chip * nb
            x = rng.random((bs, size, size, 3), np.float32)
            xd = jax.device_put(x, grid)
            pd = jax.device_put(params, repl)
            # ONE dispatch per iteration, EVERY argument committed to the
            # mesh (incl. the scalar accumulator): a sum/add outside jit
            # pays two extra op round-trips per iter; jit-closing-over
            # device arrays bakes them in as constants (50× slower); and a
            # single UNCOMMITTED argument in an otherwise sharded call
            # measured 2.4× slower through the tunnel — fully-consistent
            # commitment matches plain jit exactly (RESULTS.md round 4)
            run = jax.jit(
                lambda p, rgb, tq, acc: acc + jnp.sum(task.g_apply(
                    p, rgb.astype(task.compute_dtype), train=False,
                    trunk_q=tq).astype(jnp.float32)),
                in_shardings=(repl, grid, repl, repl), out_shardings=repl)

            zero = jax.device_put(np.zeros((), np.float32), repl)
            acc = run(pd, xd, qp, zero)
            float(acc)
            acc = zero
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = run(pd, xd, qp, acc)
            assert np.isfinite(float(acc))
            dt = (time.perf_counter() - t0) / iters
            emit("serve", mesh=f"({nb},{nh})", quant=quant or "bf16",
                 tiles_per_s=round(bs / dt, 1), batch=bs,
                 ms=round(dt * 1e3, 1))

    # giant-tile point: one (1, 3, H, W) tile H-sharded across all chips
    from nirgan_tpu.parallel.spatial import predict_large_tile

    big = 256 if SMOKE else 4096
    mesh1d = create_mesh(("data",), devices=jax.devices()[:n])
    tile = rng.random((1, 3, big, big), np.float32)
    t0 = time.perf_counter()
    pred = predict_large_tile(task, params, tile, mesh1d)
    dt = time.perf_counter() - t0
    assert np.isfinite(pred).all()
    emit("serve_giant_tile", size=big, devices=n,
         s_incl_compile=round(dt, 2),
         note="latency case spatial sharding exists for; first call "
              "includes compile — rerun for steady state on hardware")


def step_serve2d(jax):
    """Numerics gate: 2-D mesh forward == single-chip forward (plan 1)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nirgan_tpu.parallel import create_mesh
    from nirgan_tpu.parallel.spatial import spatial_predict_fn_2d

    n = jax.device_count()
    if n < 4 or n % 2:
        emit("serve2d", skipped=f"needs >=4 even devices, have {n}")
        return
    size = 64 if SMOKE else 512
    task = _flagship_task(size, config="configs/config_px2px.yaml")
    state = task.init_state(seed=0, image_size=size)
    params = jax.device_get(state.params_g)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((n // 2, size, size, 3), np.float32))

    mesh = create_mesh(("data", "spatial"), devices=jax.devices()[:n],
                       shape=(n // 2, 2))
    fn, grid = spatial_predict_fn_2d(task, mesh)
    pred2d = jax.device_get(fn(
        jax.device_put(params, NamedSharding(mesh, P())),
        jax.device_put(rgb, grid), None))
    single = jax.device_get(jax.jit(
        lambda p, x: task.g_apply(p, x.astype(task.compute_dtype),
                                  train=False))(params, rgb))
    err = float(np.max(np.abs(pred2d.astype(np.float32)
                              - np.asarray(single, np.float32))))
    bar = 1e-4 if task.compute_dtype == jnp.float32 else 1e-2
    assert err < bar, f"2-D mesh deviates: {err}"
    emit("serve2d", devices=n, max_abs_delta=err, pass_bar=f"<{bar}")


def step_scene(jax):
    """Whole-scene serving scaling (plan 6): the sliding-window path with
    window batches sharded over the full data mesh, bf16 vs int8 trunk.
    Host-side banding across PROCESSES is covered by
    tests/test_multiprocess.py::test_two_process_scene_cli; this step
    measures the single-host multi-chip window throughput."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.inference import synthesize_scene
    from nirgan_tpu.inference.scene import tile_origins
    from nirgan_tpu.parallel import create_mesh
    from nirgan_tpu.tasks import Px2PxTask

    n = jax.device_count()
    size, tile, ov = (512, 128, 16) if SMOKE else (4096, 512, 32)
    bs = (2 if SMOKE else 8) * n
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 10000, size=(3, size, size)).astype(np.uint16)
    for quant in ("none", "int8"):
        cfg = load_config(os.path.join(REPO, "configs/config_px2px.yaml"))
        cfg["tpu"] = cfg.get("tpu") or {}
        cfg.tpu.serving_quant = quant
        if SMOKE:
            cfg.base_configs.ngf = 8
            cfg.base_configs.ndf = 8
            cfg.tpu.compute_dtype = "float32"
        task = Px2PxTask(cfg)
        task.bind(task.init_state(seed=0, image_size=64))
        mesh = create_mesh(("data",))
        synthesize_scene(task, scene[:, :2 * tile, :2 * tile], tile=tile,
                         overlap=ov, batch_size=bs, mesh=mesh)  # warm
        t0 = time.perf_counter()
        out = synthesize_scene(task, scene, tile=tile, overlap=ov,
                               batch_size=bs, mesh=mesh)
        dt = time.perf_counter() - t0
        assert np.isfinite(out).all()
        nw = len(tile_origins(size + 2 * ov, tile, tile - 2 * ov)) ** 2
        emit("scene", quant=quant, devices=n, windows=nw, tile=tile,
             win_per_s=round(nw / dt, 2))


def main():
    steps = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not steps:
        steps = ["ici", "ckpt", "train", "serve2d", "serve", "scene"]
    jax = _setup()
    emit("env", platform=jax.default_backend(), devices=jax.device_count(),
         smoke=SMOKE)
    fns = {"ici": step_ici, "ckpt": step_ckpt, "train": step_train,
           "serve": step_serve, "serve2d": step_serve2d, "scene": step_scene}
    for s in steps:
        fns[s](jax)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
