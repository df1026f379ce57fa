"""Headline benchmark: 512² RGB→NIR inference throughput (tiles/sec/chip).

Measures the plain resnet_9blocks generator (the reference's serving model,
``create_synthetic_dataset.py:100-118``) in bfloat16 NHWC with the shipped
reflect-pad-10 inference path, on whatever accelerator JAX_PLATFORMS points
at (the driver runs this on the real TPU chip).

Timing method: N independent jitted invocations are dispatched with rotating
inputs, their scalar checksums chained through an accumulator, and a single
host pull at the end bounds the wall clock.  (Per-iteration host pulls — and
``block_until_ready`` — measure tunnel RTT on the axon transport, not
compute.)

Scoreboard: the reference publishes no numbers (SURVEY.md §6) and no H100
exists in this container, so the honest baseline is the hardware ceiling —
``mfu`` is the measured fraction of TPU v5e bf16 peak (197 TFLOP/s), and
``vs_baseline`` reports the same fraction (value 0.62 = 62% of
speed-of-light).  The old torch-host-CPU ratio (~2000×, vacuous) is kept
only as the labelled ``torch_host_cpu_ratio`` side-channel.

Key semantics are FROZEN as of BENCH_r04: ``vs_baseline`` = MFU fraction
(same number as ``mfu``), ``torch_host_cpu_ratio`` = tiles/s vs the torch
reference generator on this host's CPU.  (BENCH_r01/r02 predate the freeze
and recorded the CPU ratio in ``vs_baseline`` — do not trend that key
across r02→r04.)

Outage handling: the axon tunnel goes down for hours at a time, and a dead
backend either raises ("Unable to initialize backend 'axon'") or *hangs
forever* inside init.  So the default entry point runs a short subprocess
probe first, then the real measurement in a second subprocess, each under a
watchdog; on any failure it emits ONE parseable JSON line carrying the last
good measurement (``benchmarks/last_good_bench.json``, falling back to
scanning ``BENCH_r*.json``) flagged ``"stale": true`` — and exits 0, so a
tunnel outage never again costs a round its bench record (round 3's
``BENCH_r03.json`` had ``parsed: null``).
"""

import functools
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 128  # bulk-serving batch; b64→b128 measured +10%, b192 OOMs (RESULTS.md)
SIZE = 512
ITERS = 16
REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "benchmarks", "baseline_torch_cpu.json")
LAST_GOOD = os.path.join(REPO, "benchmarks", "last_good_bench.json")
# where the BENCH_r*.json fallback scan looks; tests point this at a tmpdir
# of synthesized records so driver-owned files never redden the suite
BENCH_SCAN_DIR = REPO
V5E_BF16_PEAK = 197e12  # TFLOP/s per chip
# a LIVE tunnel has been measured at 127 s for the probe child (init +
# trivial-op round trip, 2026-08-19) — 300 s produced a false STALE on a
# slow day; a dead tunnel costs one bounded 10-min wait per round instead
PROBE_TIMEOUT_S = int(os.environ.get("NIRGAN_BENCH_PROBE_TIMEOUT", 600))
# cooldown before the probe retry: must exceed the wedged-device-lease
# window (a killed client blocks the next one ~10+ min; a 300 s cooldown
# cost BENCH_r04 its live capture — probe hung, one short cooldown, hung
# again inside the same wedge)
PROBE_COOLDOWN_S = int(os.environ.get("NIRGAN_BENCH_PROBE_COOLDOWN", 600))
MEASURE_TIMEOUT_S = int(os.environ.get("NIRGAN_BENCH_MEASURE_TIMEOUT", 2400))


def generator_flops_per_tile(size: int = SIZE, pad: int = 10, ngf: int = 64,
                             n_blocks: int = 9) -> float:
    """Analytic MAC→FLOP count of the resnet_9blocks serving forward at
    (size+2·pad)² (matches the ~420 GFLOP/tile figure in RESULTS.md)."""
    s = size + 2 * pad
    f = 0.0
    f += 7 * 7 * 3 * ngf * s * s                      # stem 7×7
    f += 3 * 3 * ngf * 2 * ngf * (s // 2) ** 2        # d0
    f += 3 * 3 * 2 * ngf * 4 * ngf * (s // 4) ** 2    # d1
    f += n_blocks * 2 * 3 * 3 * (4 * ngf) ** 2 * (s // 4) ** 2  # trunk
    # convT MACs = k²·Cin·Cout·H_in·W_in (each input pixel scatters k²)
    f += 3 * 3 * 4 * ngf * 2 * ngf * (s // 4) ** 2    # u0
    f += 3 * 3 * 2 * ngf * ngf * (s // 2) ** 2        # u1
    f += 7 * 7 * ngf * 1 * s * s                      # head
    return 2.0 * f                                    # MAC → FLOP


def measure_jax() -> "tuple[float, float]":
    """Returns (bf16 tiles/s, int8-trunk tiles/s — NaN if the side-channel
    failed)."""
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config(os.path.join(REPO, "configs", "config_px2px.yaml"))
    task = Px2PxTask(cfg)  # bf16 compute, f32 params
    state = task.init_state(seed=0, image_size=SIZE)
    params = state.params_g

    from nirgan_tpu.runtime import default_compiler_options
    copts = default_compiler_options()  # +4.9%: benchmarks/xla_flags_ab.py

    @functools.partial(jax.jit, compiler_options=copts)
    def fn(p, x, acc):
        pred = task.g_apply(p, x, train=False)
        return acc + jnp.sum(pred.astype(jnp.float32))

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3), dtype=np.float32))
          for _ in range(4)]

    def timed(f, *extra):
        acc = f(params, *extra, xs[0], jnp.zeros((), jnp.float32))
        float(acc)  # warm-up + compile barrier
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for i in range(ITERS):
            acc = f(params, *extra, xs[i % len(xs)], acc)
        checksum = float(acc)  # single sync
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        return BATCH * ITERS / dt

    tps = timed(fn)

    # side-channel: the opt-in int8 serving trunk (tpu.serving_quant,
    # ops/int8_trunk.py — PSNR-guarded; parity path above stays the headline)
    tps_int8 = float("nan")
    try:
        qp = task.build_trunk_q(params, xs[0].astype(task.compute_dtype))

        copts8 = default_compiler_options("serve_int8")

        @functools.partial(jax.jit, compiler_options=copts8)
        def fn8(p, q, x, acc):
            pred = task.g_apply(p, x, train=False, trunk_q=q)
            return acc + jnp.sum(pred.astype(jnp.float32))

        tps_int8 = timed(fn8, qp)
    except Exception as e:  # never fail the headline on the side-channel
        print(f"int8 side-channel skipped: {e}", file=sys.stderr)
    return tps, tps_int8


def measure_torch_cpu_baseline() -> float:
    """Torch reference generator on host CPU (cached)."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["tiles_per_sec"]
    ref_path = "/root/reference/model/networks.py"
    if not os.path.exists(ref_path):
        return float("nan")
    import importlib.util
    import torch

    spec = importlib.util.spec_from_file_location("ref_networks_bench", ref_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    norm_layer = mod.get_norm_layer("instance")
    net = mod.ResnetGenerator(3, 1, 64, norm_layer=norm_layer,
                              use_dropout=False, n_blocks=9).eval()
    x = torch.rand(1, 3, SIZE + 20, SIZE + 20)  # reflect-pad-10 parity
    with torch.no_grad():
        net(x)  # warm-up
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            net(x)
        dt = time.perf_counter() - t0
    tps = n / dt
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    with open(CACHE, "w") as f:
        json.dump({"tiles_per_sec": tps, "hardware": "host CPU",
                   "model": "reference ResnetGenerator 9 blocks, 512²+20 pad"}, f)
    return tps


def _measure_main():
    """Child mode: run the real measurement and print the JSON line."""
    tps, tps_int8 = measure_jax()
    base = measure_torch_cpu_baseline()
    cpu_ratio = tps / base if np.isfinite(base) and base > 0 else 0.0
    mfu = tps * generator_flops_per_tile() / V5E_BF16_PEAK
    out = {
        "metric": "512x512 RGB->NIR inference throughput (bf16, "
                  "reflect-pad-10); vs_baseline = fraction of v5e bf16 "
                  "speed-of-light (reference publishes no numbers)",
        "value": round(tps, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(mfu, 3),
        "mfu": round(mfu, 3),
        "torch_host_cpu_ratio": round(cpu_ratio, 1),
    }
    if np.isfinite(tps_int8):
        # opt-in int8-trunk serving mode (tpu.serving_quant: int8; PSNR-
        # guarded, benchmarks/parity_report.json)
        out["int8_trunk_tiles_per_sec"] = round(tps_int8, 2)
    print(json.dumps(out))


def _probe_main():
    """Child mode: init the backend and push one op through it."""
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()  # persistent compile cache — repeat probes start warm
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8), jnp.float32)
    assert float(jnp.sum(x)) == 64.0
    print("PROBE_OK", jax.devices()[0].platform)


def _load_last_good() -> "dict | None":
    """Most recent successful measurement, for the outage fallback line."""
    if os.path.exists(LAST_GOOD):
        try:
            with open(LAST_GOOD) as f:
                return json.load(f)
        except Exception:
            pass
    best = None
    for path in sorted(glob.glob(os.path.join(BENCH_SCAN_DIR, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec.get("parsed") and rec["parsed"].get("value"):
                best = dict(rec["parsed"])
                best["source"] = os.path.basename(path)
        except Exception:
            continue
    return best


def _emit_fallback(reason: str) -> None:
    last = _load_last_good()
    out = {
        "metric": "512x512 RGB->NIR inference throughput (bf16, "
                  "reflect-pad-10) — STALE: TPU unreachable this run, value "
                  "is the last good measurement",
        "value": last.get("value") if last else None,
        "unit": "tiles/sec/chip",
        "vs_baseline": last.get("vs_baseline") if last else None,
        "stale": True,
        "error": reason,
        "last_good": last,
    }
    print(json.dumps(out))


def _run_child(mode: str, timeout_s: int) -> "tuple[int, str]":
    """Run `python bench.py <mode>` under a watchdog; returns (rc, stdout).

    rc=-1 means the watchdog fired (a dead tunnel can hang forever inside
    backend init, so a plain try/except is not enough).
    """
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO)
        sys.stderr.write(res.stderr[-2000:])
        return res.returncode, res.stdout
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else e.stderr.decode()
            sys.stderr.write(err[-2000:])
        return -1, ""


def main():
    # two probe attempts with a cooldown between: a KILLED axon client (any
    # watchdog-fired process earlier in the session) wedges the device lease
    # ~10 min, during which a LIVE tunnel looks exactly like a dead one
    # (hang in backend init) — see RESULTS.md "wedged device lease"
    for attempt in range(2):
        rc, out = _run_child("--_probe", PROBE_TIMEOUT_S)
        if rc == 0 and "PROBE_OK" in out:
            break
        if attempt == 0:
            print("probe attempt 1 failed (rc=%d); cooling down %ds in case "
                  "of a wedged device lease" % (rc, PROBE_COOLDOWN_S),
                  file=sys.stderr)
            time.sleep(PROBE_COOLDOWN_S)
    if rc != 0 or "PROBE_OK" not in out:
        why = ("backend probe hung >%ds twice" % PROBE_TIMEOUT_S if rc == -1
               else "backend probe failed (rc=%d) — axon tunnel down?" % rc)
        _emit_fallback(why)
        return 0
    rc, out = _run_child("--_measure", MEASURE_TIMEOUT_S)
    line = next((l for l in reversed(out.strip().splitlines())
                 if l.startswith("{")), None)
    if rc != 0 or line is None:
        why = ("measurement hung >%ds" % MEASURE_TIMEOUT_S if rc == -1
               else "measurement failed (rc=%d)" % rc)
        _emit_fallback(why)
        return 0
    try:  # persist for future outage fallbacks
        parsed = json.loads(line)
        parsed["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
        with open(LAST_GOOD, "w") as f:
            json.dump(parsed, f, indent=1)
    except Exception:
        pass
    print(line)
    return 0


if __name__ == "__main__":
    if "--_measure" in sys.argv:
        _measure_main()
    elif "--_probe" in sys.argv:
        _probe_main()
    else:
        sys.exit(main())
