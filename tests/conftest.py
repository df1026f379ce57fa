"""Test bootstrap.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4 point d).  Environment must be
set before jax is imported anywhere.
"""

import os
import sys

# The session environment pre-sets JAX_PLATFORMS=axon (the tunnelled TPU) and
# a sitecustomize registers the axon PJRT plugin in every interpreter, so the
# env var alone is not enough — the jax config must be overridden before the
# backend is first initialised.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def load_reference_module(relpath: str, name: str):
    """Import a module from the read-only torch reference for golden-parity
    checks (we compare against its *behaviour*; its code is never vendored).
    Returns None when the reference checkout is absent so the suite also
    passes standalone."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
