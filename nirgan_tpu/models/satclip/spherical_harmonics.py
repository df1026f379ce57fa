"""Real spherical-harmonic features of (lon, lat).

Replaces the reference's generated 34k-line analytic file (a missing git
blob, ``model/satclip/positional_encoding/spherical_harmonics_ylm.py``; see
SURVEY.md §0.1) with the closed-form associated-Legendre recurrence
(reference ``spherical_harmonics_closed_form.py:8-40``), evaluated with the
(l, m) loops fully unrolled at trace time — each term is a handful of fused
VPU ops on a (B,)-vector, so there is nothing to gain from a table.

Two conventions are provided because the reference's sympy generator
(``spherical_harmonics_generate_ylms.py:21-33``) emits formulas that differ
from the closed form:

  * m == 0 terms: the generator writes ``sqrt((2l+1)/4 * pi)`` — the π lands
    in the numerator, scaling the closed form's ``sqrt((2l+1)/(4π))`` by π.
  * m != 0 terms: the generator multiplies by (−1)^m on top of sympy's
    Condon-Shortley-phased P_l^m, while the closed form keeps a single CS
    phase — a net (−1)^{|m|} sign difference.

The published SatCLIP checkpoints were trained with the *analytic*
convention (``harmonics_calculation='analytic'``), so that is the default;
``closed-form`` gives the textbook normalisation.
"""

from __future__ import annotations

import math
from typing import Literal

__all__ = ["sh_features", "embedding_dim"]


def embedding_dim(legendre_polys: int) -> int:
    return legendre_polys * legendre_polys


def _assoc_legendre(l: int, m: int, x, xp):
    """P_l^m(x) with Condon-Shortley phase, stable upward recurrence."""
    pmm = xp.ones_like(x)
    if m > 0:
        somx2 = xp.sqrt((1 - x) * (1 + x))
        fact = 1.0
        for _ in range(1, m + 1):
            pmm = pmm * (-fact) * somx2
            fact += 2.0
    if l == m:
        return pmm
    pmmp1 = x * (2.0 * m + 1.0) * pmm
    if l == m + 1:
        return pmmp1
    pll = None
    for ll in range(m + 2, l + 1):
        pll = ((2.0 * ll - 1.0) * x * pmmp1 - (ll + m - 1.0) * pmm) / (ll - m)
        pmm, pmmp1 = pmmp1, pll
    return pll


def _renorm(l: int, m: int) -> float:
    return math.sqrt(
        (2.0 * l + 1.0) * math.factorial(l - m) / (4.0 * math.pi * math.factorial(l + m))
    )


def _sh_term(m: int, l: int, phi, theta, xp, convention: str):
    ct = xp.cos(theta)
    if m == 0:
        y = _renorm(l, 0) * _assoc_legendre(l, 0, ct, xp)
        if convention == "analytic":
            y = y * math.pi
        return y
    am = abs(m)
    base = math.sqrt(2.0) * _renorm(l, am) * _assoc_legendre(l, am, ct, xp)
    trig = xp.cos(am * phi) if m > 0 else xp.sin(am * phi)
    y = base * trig
    if convention == "analytic":
        y = y * ((-1.0) ** am)
    return y


def sh_features(
    lonlat,
    legendre_polys: int = 10,
    convention: Literal["analytic", "closed-form"] = "analytic",
    xp=None,
):
    """(B, 2) lon/lat degrees → (B, L²) SH features.

    Angle mapping follows the reference (``spherical_harmonics.py:27-42``):
    φ = deg2rad(lon + 180), θ = deg2rad(lat + 90).  ``xp`` selects the array
    backend (numpy for the frozen float64 host path, jax.numpy on device).
    """
    if xp is None:
        import numpy as xp  # noqa: PLC0415
    lon, lat = lonlat[:, 0], lonlat[:, 1]
    phi = (lon + 180.0) * (math.pi / 180.0)
    theta = (lat + 90.0) * (math.pi / 180.0)
    feats = []
    for l in range(legendre_polys):
        for m in range(-l, l + 1):
            feats.append(_sh_term(m, l, phi, theta, xp, convention))
    return xp.stack(feats, axis=-1)
