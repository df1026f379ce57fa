"""AOT export of the serving graph (StableHLO via ``jax.export``).

Deployment path the torch reference lacks: the jitted RGB→NIR predict
program — reflect-pad, (blocked) generator forward, crop, all SatCLIP
routes — serializes to a portable artifact that a serving host can load and
run without the model code, config system, or Python class tree.  The
artifact pins input shapes/dtypes and the lowering platform(s); params
remain a runtime argument so checkpoint rotation does not re-export.

Round-trip tested in ``tests/test_inference.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_generator", "load_exported", "run_exported"]


def export_generator(task, params_g, image_size: int, batch_size: int,
                     platforms: Optional[Sequence[str]] = None,
                     trunk_q=None) -> bytes:
    """Serialize the predict program for (B, 3, H, W) float32 NCHW inputs
    (the universal host contract) at a fixed shape.

    ``task``: a Px2PxTask; ``params_g``: its generator params (shape/dtype
    template — the exported fn takes params as an argument).
    ``platforms``: e.g. ["tpu"] to cross-lower from a CPU host.
    ``trunk_q``: an int8 trunk pack (``task.build_trunk_q``) exports the
    int8 serving program instead; the pack becomes a fourth runtime
    argument so recalibration does not re-export.
    Returns the serialized artifact bytes.
    """
    inject = task.satclip and task.satclip_style == "inject"

    spec_of = lambda p: jax.ShapeDtypeStruct(np.shape(p), np.asarray(p).dtype)
    rgb_spec = jax.ShapeDtypeStruct((batch_size, 3, image_size, image_size),
                                    jnp.float32)
    embeds_spec = jax.ShapeDtypeStruct((batch_size, 256), jnp.float32)
    params_spec = jax.tree.map(spec_of, params_g)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}

    if trunk_q is None:
        def fn(params, rgb_nchw, embeds):
            x = jnp.transpose(rgb_nchw, (0, 2, 3, 1)).astype(task.compute_dtype)
            pred = task.g_apply(params, x, embeds if inject else None,
                                train=False)
            return jnp.transpose(pred.astype(jnp.float32), (0, 3, 1, 2))

        exported = jax_export.export(jax.jit(fn), **kwargs)(
            params_spec, rgb_spec, embeds_spec)
    else:
        def fn8(params, rgb_nchw, embeds, tq):
            x = jnp.transpose(rgb_nchw, (0, 2, 3, 1)).astype(task.compute_dtype)
            pred = task.g_apply(params, x, embeds if inject else None,
                                train=False, trunk_q=tq)
            return jnp.transpose(pred.astype(jnp.float32), (0, 3, 1, 2))

        exported = jax_export.export(jax.jit(fn8), **kwargs)(
            params_spec, rgb_spec, embeds_spec, jax.tree.map(spec_of, trunk_q))
    return exported.serialize()


def load_exported(blob: bytes):
    """bytes → the deserialized Exported object (``.call(params, rgb,
    embeds)`` runs it under jit on the current backend)."""
    return jax_export.deserialize(bytearray(blob))


def run_exported(blob_or_exported, params_g, rgb_nchw, embeds=None,
                 trunk_q=None):
    """Convenience: run a serialized/deserialized artifact.  ``embeds`` may
    be None for non-inject models (a zero placeholder is fed — the traced
    graph ignores it).  ``trunk_q`` is required iff the artifact was
    exported with one."""
    exported = (blob_or_exported if hasattr(blob_or_exported, "call")
                else load_exported(blob_or_exported))
    if embeds is None:
        embeds = np.zeros((np.shape(rgb_nchw)[0], 256), np.float32)
    args = (params_g, jnp.asarray(rgb_nchw, jnp.float32),
            jnp.asarray(embeds, jnp.float32))
    if trunk_q is not None:
        args += (trunk_q,)
    return exported.call(*args)
