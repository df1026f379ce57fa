"""default_compiler_options policy (runtime/setup.py).

The serve-graph scoped-VMEM option is measured +4.9% on the forward graph
and a regression on the fused train step (RESULTS.md round 5 cont.), so the
helper must (a) emit it only for serve-class graphs, (b) emit it only when
the configured platform is a TPU backend — the CPU compiler rejects TPU
options and this suite runs on CPU — and (c) honor the env kill-switch.
"""

import os

from nirgan_tpu.runtime import default_compiler_options


def test_cpu_platform_returns_none():
    # conftest forces the cpu platform for the whole suite
    assert default_compiler_options() is None
    assert default_compiler_options("serve") is None


def test_train_graph_always_none(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert default_compiler_options("train") is None


def test_tpu_platform_emits_vmem_option(monkeypatch):
    import jax

    # the config (forced to cpu by conftest) wins over the env var, so
    # clear it for the duration of this check
    prev = jax.config.jax_platforms
    jax.config.update("jax_platforms", None)
    try:
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        opts = default_compiler_options()
        assert opts == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
        # int8 trunk serving peaks at a higher scoped budget (RESULTS.md)
        assert default_compiler_options("serve_int8") == {
            "xla_tpu_scoped_vmem_limit_kib": "98304"}

        monkeypatch.setenv("NIRGAN_XLA_VMEM_KIB", "32768")
        assert default_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "32768"}

        monkeypatch.setenv("NIRGAN_XLA_VMEM_KIB", "0")
        assert default_compiler_options() is None
    finally:
        jax.config.update("jax_platforms", prev)
