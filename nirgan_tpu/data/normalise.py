"""Image normalisation helpers.

``minmax_percentile`` fills the contract of the reference's gitignored
``data/normalise_s2.py`` (imported at ``utils/logging_helpers.py:5`` and used
only for plot stretching): clip to the [p, 100−p] percentile range and
rescale to [0, 1].
"""

from __future__ import annotations

import numpy as np


def minmax_percentile(img, perc: float = 2.0):
    """Percentile min-max stretch to [0, 1].  Accepts numpy or jax arrays of
    any shape; returns numpy float32."""
    x = np.asarray(img, np.float32)
    lo = np.percentile(x, perc)
    hi = np.percentile(x, 100.0 - perc)
    if hi <= lo:
        return np.zeros_like(x)
    return np.clip((x - lo) / (hi - lo), 0.0, 1.0)
