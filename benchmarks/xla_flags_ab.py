"""XLA compiler-options A/B on the real graphs — the one compiler lever not
yet in RESULTS.md.

Every op/assembly/kernel line is closed by measurement (RESULTS.md rounds
2-5); what had never been tried is letting XLA itself behave differently.
``XLA_FLAGS`` cannot carry ``--xla_tpu_*`` flags here — the axon client
parses the env var against host XLA and aborts on unknown flags (the real
compile happens server-side) — but the PJRT AOT path forwards per-compile
options: ``jit(f).lower(...).compile(compiler_options={...})`` reaches the
server compiler, which VALIDATES them (a bogus key returns HTTP 500), so
acceptance of a row is itself meaningful.

Sweeps the production bf16 serve graph (b128 @512²+pad-10, the bench.py
headline shape) and, with ``--train``, the fused train step (256² b32)
under scoped-VMEM-limit and scheduler options.  Timing method matches
bench.py: N dispatches with rotating inputs chained through a scalar
checksum accumulator (serve) / the device-resident TrainState (train), one
host pull at the end.  Every config runs through the SAME AOT executable
call path, so dispatch overhead cancels in the comparison; an ordinary
``jax.jit`` row anchors the AOT path against the bench.py number.

Run on the TPU: ``python benchmarks/xla_flags_ab.py [--train]``.
Results: RESULTS.md "Round 5 (cont.): XLA compiler-options sweep".
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _env_int(name, default):
    return int(os.environ.get(name, default))

BATCH = _env_int("NIRGAN_FLAGAB_BATCH", 128)
SIZE = _env_int("NIRGAN_FLAGAB_SIZE", 512)
ITERS = _env_int("NIRGAN_FLAGAB_ITERS", 12)
TRAIN_BATCH = _env_int("NIRGAN_FLAGAB_TRAIN_BATCH", 32)
TRAIN_SIZE = _env_int("NIRGAN_FLAGAB_TRAIN_SIZE", 256)
TRAIN_ITERS = _env_int("NIRGAN_FLAGAB_TRAIN_ITERS", 10)

def _vmem(kib):
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}

CONFIGS = [
    ("baseline", {}),
    ("vmem32m", _vmem(32768)),
    ("vmem48m", _vmem(49152)),
    ("vmem64m", _vmem(65536)),
    ("vmem96m", _vmem(98304)),
    ("vmem128m", _vmem(131072)),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("no_dot_strength_red", {"xla_tpu_enable_dot_strength_reduction": "false"}),
]

# follow-up passes (first sweep's verdicts in RESULTS.md round 5 cont.):
# fine = serve optimum neighbourhood; train2 = is the 32 MiB train win real
# (repeats); int8 = the int8 trunk leg's own optimum (different VMEM
# appetite than bf16)
CONFIGS_BY_MODE = {
    "serve": CONFIGS,
    "train": CONFIGS,
    "fine": [("baseline", {}), ("vmem56m", _vmem(57344)),
             ("vmem64m", _vmem(65536)), ("vmem72m", _vmem(73728)),
             ("vmem80m", _vmem(81920))],
    "train2": [("baseline", {}), ("vmem24m", _vmem(24576)),
               ("vmem32m", _vmem(32768)), ("vmem40m", _vmem(40960))],
    "int8": [("baseline", {}), ("vmem32m", _vmem(32768)),
             ("vmem64m", _vmem(65536)), ("vmem96m", _vmem(98304)),
             ("vmem128m", _vmem(131072))],
}


def main(mode: str = "serve", repeat: int = 1):
    train = mode in ("train", "train2")
    int8 = mode == "int8"
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config(os.path.join(REPO, "configs", "config_px2px.yaml"))
    task = Px2PxTask(cfg)
    rng = np.random.default_rng(0)

    if train:
        state = task.init_state(seed=0, image_size=TRAIN_SIZE)
        step = task.make_train_step()
        ex = task.extract_batch({
            "rgb": rng.random((TRAIN_BATCH, 3, TRAIN_SIZE, TRAIN_SIZE),
                              np.float32),
            "nir": rng.random((TRAIN_BATCH, 1, TRAIN_SIZE, TRAIN_SIZE),
                              np.float32)})
        ex = {k: jnp.asarray(v) for k, v in ex.items()}
        lowered = step.lower(state, ex)
        del state  # the step donates its state arg — never reuse one

        def timed(call):
            # fresh state per config: the executable donates arg 0, so the
            # warm-up call consumes whatever state we hand it
            s, m = call(task.init_state(seed=0, image_size=TRAIN_SIZE), ex)
            float(jax.device_get(m["model_loss/generator_total_loss"]))
            t0 = time.perf_counter()
            for _ in range(TRAIN_ITERS):
                s, m = call(s, ex)
            chk = float(jax.device_get(m["model_loss/generator_total_loss"]))
            dt = time.perf_counter() - t0
            assert np.isfinite(chk)
            return {"ms_per_step": round(1e3 * dt / TRAIN_ITERS, 1),
                    "img_per_sec": round(TRAIN_BATCH * TRAIN_ITERS / dt, 1)}

        jit_anchor = timed(step)
    else:
        st = task.init_state(seed=0, image_size=SIZE)
        params = st.params_g

        @jax.jit
        def fn(p, x, acc):
            pred = task.g_apply(p, x, train=False)
            return acc + jnp.sum(pred.astype(jnp.float32))

        xs = [jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3), dtype=np.float32))
              for _ in range(4)]
        if int8:
            qp = task.build_trunk_q(params, xs[0].astype(task.compute_dtype))

            @jax.jit
            def fn(p, x, acc):
                pred = task.g_apply(p, x, train=False, trunk_q=qp)
                return acc + jnp.sum(pred.astype(jnp.float32))

        lowered = fn.lower(params, xs[0], jnp.zeros((), jnp.float32))

        def timed(call):
            acc = call(params, xs[0], jnp.zeros((), jnp.float32))
            float(acc)
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for i in range(ITERS):
                acc = call(params, xs[i % len(xs)], acc)
            chk = float(acc)
            dt = time.perf_counter() - t0
            assert np.isfinite(chk)
            return {"tiles_per_sec": round(BATCH * ITERS / dt, 1)}

        jit_anchor = timed(fn)

    print(f"jit anchor (bench.py path): {jit_anchor}", flush=True)
    rows = []
    for name, opts in CONFIGS_BY_MODE[mode]:
        t0 = time.time()
        try:
            exe = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            rows.append((name, opts, None, f"REJECTED: {str(e)[:90]}"))
            print(f"{name}: REJECTED ({str(e)[:90]})", flush=True)
            continue
        recs = [timed(exe) for _ in range(repeat)]
        rec = recs[0] if repeat == 1 else {
            k: [r[k] for r in recs] for k in recs[0]}
        rows.append((name, opts, rec, f"compile+run {time.time()-t0:.0f}s"))
        print(f"{name}: {rec} ({time.time()-t0:.0f}s)", flush=True)

    label = ("train b32@256²" if train else
             ("int8 serve b128@512²" if int8 else "serve b128@512²"))
    print(f"\n| config | compiler_options | {label} |")
    print("|---|---|---|")
    print(f"| jit anchor | (bench.py path) | {json.dumps(jit_anchor)} |")
    for name, opts, rec, note in rows:
        print(f"| {name} | `{json.dumps(opts)}` | "
              f"{json.dumps(rec) if rec else note} |")


if __name__ == "__main__":
    _mode = "serve"
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            _mode = a.split("=", 1)[1]
        elif a == "--train":
            _mode = "train"
    _rep = 1
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            _rep = int(a.split("=", 1)[1])
    main(_mode, _rep)
