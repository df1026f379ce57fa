"""Spatial padding (NHWC)."""

import jax.numpy as jnp


def reflect_pad2d(x, pad: int):
    """Reflection padding, torch ``nn.ReflectionPad2d`` semantics.

    Used by the generator stem/blocks (reference ``model/networks.py:341,406``)
    and by the edge-artifact padding of the task module
    (``model/pix2pix.py:91-93``).
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
