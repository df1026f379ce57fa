"""Spatial padding (NHWC)."""

import numpy as np

import jax.numpy as jnp


def composed_reflect_idx(n: int, pads) -> np.ndarray:
    """Index map of the COMPOSED reflect padding along one axis.

    ``composed_reflect_idx(n, (p1, p2, …))[j]`` is the source index in
    ``[0, n)`` of output position ``j`` after applying
    ``reflect_pad(…reflect_pad(x, p1)…, p2)`` in sequence.  Composition
    matters: ``reflect_pad(reflect_pad(x, 10), 3)`` ≠ ``reflect_pad(x, 13)``
    at the borders (the second reflect mirrors already-mirrored rows).
    Used by the pad-folding convs to rebuild border bands exactly
    (ops/reflect_conv.py) without materialising any padded tensor.
    """
    idx = np.arange(n)
    for p in pads:
        if p == 0:
            continue
        m = idx.shape[0]
        assert p < m, (p, m)
        j = np.arange(-p, m + p)
        j = np.abs(j)
        j = m - 1 - np.abs(m - 1 - j)
        idx = idx[j]
    return idx


def reflect_pad2d(x, pad: int):
    """Reflection padding, torch ``nn.ReflectionPad2d`` semantics.

    Used by the generator stem/blocks (reference ``model/networks.py:341,406``)
    and by the edge-artifact padding of the task module
    (``model/pix2pix.py:91-93``).
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
