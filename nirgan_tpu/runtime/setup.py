"""Process-level runtime setup shared by all CLIs.

Centralises the JAX runtime knobs the reference scatters over torch
globals (``torch.set_float32_matmul_precision`` at ``train.py:29``):

  * persistent compilation cache — first compiles of the 9-block generator
    take 20-40 s (more through the axon tunnel); the cache makes every
    subsequent process start warm,
  * optional NaN debugging (the TPU-side analogue of the reference's
    EMD asserts / check_finite, SURVEY.md §5.2),
  * optional f32 matmul precision override for parity experiments.
"""

from __future__ import annotations

import os

__all__ = ["setup_runtime", "default_compiler_options"]


def default_compiler_options(graph: str = "serve") -> "dict[str, str] | None":
    """Per-compile XLA options for the hot jits (pass as
    ``jax.jit(..., compiler_options=...)``).

    ``xla_tpu_scoped_vmem_limit_kib=65536`` raises the VMEM budget XLA's
    fusion/emitter passes may assume per scoped allocation; measured on the
    real graphs (``benchmarks/xla_flags_ab.py``, RESULTS.md round 5 cont.)
    it buys **+4.9% serving throughput** (292.4 → 306.8 tiles/s b128 @512²)
    — the first lever that moved the serve headline in four rounds — but
    makes the fused TRAIN step monotonically SLOWER above 32 MiB (121.6 →
    124.5 ms b32 @256² at 64 MiB), so it is scoped to forward/serving
    graphs: ``graph="train"`` returns None (compiler defaults).  Value is
    env-tunable via ``NIRGAN_XLA_VMEM_KIB`` (``0`` disables).

    Only emitted when the *configured* platform is a TPU backend — the CPU
    compiler rejects TPU options (the test suite runs on an 8-device CPU
    mesh).  The platform is decided from configuration (``jax_platforms``
    config / ``JAX_PLATFORMS`` env), NEVER from ``jax.devices()``, which
    blocks forever when the axon tunnel is down (CLAUDE.md).
    """
    if graph == "train":
        return None
    # int8 trunk serving peaks at a higher scoped budget than bf16 (96 MiB:
    # 417.9 vs 416.5 t/s at 64 MiB, repeats outside the run-to-run spread)
    default = "98304" if graph == "serve_int8" else "65536"
    kib = os.environ.get("NIRGAN_XLA_VMEM_KIB", default)
    if not kib or kib == "0":
        return None
    plats = ""
    try:
        import jax

        plats = jax.config.jax_platforms or ""
    except Exception:
        pass
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    plat = plats.split(",")[0].strip().lower()
    if plat in ("axon", "tpu"):
        return {"xla_tpu_scoped_vmem_limit_kib": kib}
    return None


def setup_runtime(cache_dir: str | None = None, debug_nans: bool = False,
                  matmul_precision: str | None = None):
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "NIRGAN_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation, never a requirement
    if debug_nans or os.environ.get("NIRGAN_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)

    # Multi-host bootstrap for every CLI (SURVEY.md §2.9): on TPU pods
    # NIRGAN_MULTIHOST=1 auto-discovers; elsewhere give the coordinator
    # explicitly.  The data layer picks up jax.process_index()/count()
    # (select_dataset.py) and CheckpointManager coordinates saves.
    if os.environ.get("NIRGAN_MULTIHOST"):
        from nirgan_tpu.parallel import initialize_multihost

        coord = os.environ.get("NIRGAN_COORDINATOR")  # "host:port" or unset
        if coord:
            initialize_multihost(
                coordinator_address=coord,
                num_processes=int(os.environ["NIRGAN_NUM_PROCESSES"]),
                process_id=int(os.environ["NIRGAN_PROCESS_ID"]))
        else:
            initialize_multihost()
