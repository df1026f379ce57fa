"""The seven positional-encoding families of the SatCLIP stack
(reference ``model/satclip/positional_encoding/``): direct, cartesian3d,
wrap, theory, grid-and-sphere (grid / spherec / spherecplus / spherem /
spheremplus), spherical harmonics (analytic & closed-form conventions), and
discretized spherical harmonics.

Implementation notes
  * Encoders are frozen, parameter-free coordinate transforms; like the
    reference (whose Theory/GridAndSphere forwards are numpy on CPU,
    ``theory.py:61-90``) they default to numpy but accept ``xp=jnp`` to run
    fused on device.
  * Reference quirks preserved: the grid/sphere encoders keep the
    duplicated frequency pairs from the (freq, 2) tiling
    (``grid_and_sphere.py:96-100``); the discretized-SH lookup uses the
    reference's two-tap interpolation whose weights do not sum to one
    (``discretized_spherical_harmonics.py:interpolate_pixel_values``) and a
    unit-degree index into a 360/359-degree-spaced grid.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import flax.linen as _nn

from nirgan_tpu.models.satclip.spherical_harmonics import embedding_dim, sh_features

__all__ = [
    "Direct", "Cartesian3D", "Wrap", "Theory", "GridAndSphere",
    "SphericalHarmonics",
    "WeightedSphericalHarmonics", "DiscretizedSphericalHarmonics",
    "get_positional_encoding",
]

_D2R = math.pi / 180.0


def cal_freq_list(freq_init: str, frequency_num: int, max_radius: float,
                  min_radius: float) -> np.ndarray:
    """Geometric (or random) frequency ladder (reference ``common.py``)."""
    if freq_init == "random":
        return np.random.random(frequency_num) * max_radius
    log_inc = math.log(max_radius / min_radius) / (frequency_num - 1.0)
    timescales = min_radius * np.exp(np.arange(frequency_num, dtype=float) * log_inc)
    return 1.0 / timescales


@dataclass
class Direct:
    embedding_dim: int = 2

    def __call__(self, coords, xp=np):
        return xp.asarray(coords) * _D2R - math.pi


@dataclass
class Cartesian3D:
    embedding_dim: int = 3

    def __call__(self, coords, xp=np):
        c = xp.asarray(coords) * _D2R
        lon, lat = c[:, 0], c[:, 1]
        return xp.stack([xp.cos(lon) * xp.cos(lat),
                         xp.sin(lon) * xp.cos(lat),
                         xp.sin(lat)], axis=1)


@dataclass
class Wrap:
    embedding_dim: int = 4

    def __call__(self, coords, xp=np):
        c = xp.asarray(coords) * _D2R
        lon, lat = c[:, 0], c[:, 1]
        return xp.stack([xp.cos(lon), xp.sin(lon), xp.cos(lat), xp.sin(lat)], axis=1)


@dataclass
class Theory:
    """Three 120°-apart unit vectors × a frequency ladder, sin/cos
    interleaved (reference ``theory.py:11-90``)."""

    frequency_num: int = 16
    max_radius: float = 10000.0
    min_radius: float = 1000.0
    freq_init: str = "geometric"

    def __post_init__(self):
        self.freq_list = cal_freq_list(self.freq_init, self.frequency_num,
                                       self.max_radius, self.min_radius)
        self.embedding_dim = 2 * 3 * self.frequency_num
        self.unit_vecs = np.asarray([
            [1.0, 0.0],
            [-0.5, math.sqrt(3) / 2.0],
            [-0.5, -math.sqrt(3) / 2.0],
        ])

    def __call__(self, coords, xp=np):
        c = xp.asarray(coords, dtype=xp.float64 if xp is np else None)
        angles = c @ xp.asarray(self.unit_vecs.T)                     # (B, 3)
        ang6 = xp.repeat(angles, 2, axis=1)                           # a a b b c c
        scaled = ang6[:, None, :] * xp.asarray(self.freq_list)[None, :, None]
        flat = scaled.reshape(c.shape[0], -1)                         # (B, 6f)
        even = xp.sin(flat[:, 0::2])
        odd = xp.cos(flat[:, 1::2])
        out = xp.stack([even, odd], axis=-1).reshape(c.shape[0], -1)
        return out


@dataclass
class GridAndSphere:
    """grid | spherec | spherecplus | spherem | spheremplus
    (reference ``grid_and_sphere.py:11-318``)."""

    frequency_num: int = 16
    max_radius: float = 0.01
    min_radius: float = 0.00001
    freq_init: str = "geometric"
    name: str = "grid"

    def __post_init__(self):
        self.freq_list = cal_freq_list(self.freq_init, self.frequency_num,
                                       self.max_radius, self.min_radius)
        dims = {"grid": 4, "spherec": 6, "spherecplus": 12,
                "spherem": 10, "spheremplus": 16}
        self.embedding_dim = dims[self.name] * self.frequency_num

    def __call__(self, coords, xp=np):
        c = xp.asarray(coords, dtype=xp.float64 if xp is np else None)
        b = c.shape[0]
        f = self.frequency_num
        # raw coords broadcast to (B, 2, f, 2); scaled version × freq
        raw = xp.broadcast_to(c[:, :, None, None], (b, 2, f, 2))
        freq = xp.asarray(self.freq_list)[None, None, :, None]
        scaled = raw * freq

        lon, lat = scaled[:, 0], scaled[:, 1]            # (B, f, 2)
        lon_r, lat_r = raw[:, 0], raw[:, 1]

        if self.name == "grid":
            out = xp.stack([xp.sin(scaled[..., 0]), xp.cos(scaled[..., 1])],
                           axis=-1)                       # (B, 2, f, 2)
            return out.reshape(b, -1)
        if self.name == "spherec":
            parts = [xp.sin(lat), xp.cos(lat) * xp.cos(lon), xp.cos(lat) * xp.sin(lon)]
        elif self.name == "spherecplus":
            parts = [xp.sin(lat), xp.cos(lat), xp.sin(lon), xp.cos(lon),
                     xp.cos(lat) * xp.cos(lon), xp.cos(lat) * xp.sin(lon)]
        elif self.name == "spherem":
            parts = [xp.sin(lat), xp.cos(lat) * xp.cos(lon_r),
                     xp.cos(lat_r) * xp.cos(lon), xp.cos(lat) * xp.sin(lon_r),
                     xp.cos(lat_r) * xp.sin(lon)]
        elif self.name == "spheremplus":
            parts = [xp.sin(lat), xp.cos(lat), xp.sin(lon), xp.cos(lon),
                     xp.cos(lat) * xp.cos(lon_r), xp.cos(lat_r) * xp.cos(lon),
                     xp.cos(lat) * xp.sin(lon_r), xp.cos(lat_r) * xp.sin(lon)]
        else:
            raise ValueError(self.name)
        return xp.concatenate(parts, axis=-1).reshape(b, -1)


@dataclass
class SphericalHarmonics:
    legendre_polys: int = 10
    harmonics_calculation: str = "analytic"

    def __post_init__(self):
        self.embedding_dim = embedding_dim(self.legendre_polys)

    def __call__(self, coords, xp=np):
        conv = ("closed-form" if self.harmonics_calculation == "closed-form"
                else "analytic")
        return sh_features(xp.asarray(coords), self.legendre_polys, conv, xp=xp)


@dataclass
class DiscretizedSphericalHarmonics:
    """SH features pre-tabulated on a 1°-ish lon/lat grid, looked up with the
    reference's two-tap interpolation (quirks preserved — see module doc)."""

    legendre_polys: int = 10
    grid: np.ndarray = field(default=None, repr=False)

    def __post_init__(self):
        self.embedding_dim = embedding_dim(self.legendre_polys)
        lon = np.linspace(-180.0, 180.0, 360)
        lat = np.linspace(-90.0, 90.0, 180)
        lons, lats = np.meshgrid(lon, lat)              # (180, 360)
        pts = np.stack([lons.ravel(), lats.ravel()], axis=-1)
        feats = sh_features(pts, self.legendre_polys, "analytic", xp=np)
        ys = feats.T.reshape(self.embedding_dim, 180, 360)
        self.grid = np.transpose(ys, (0, 2, 1))          # (F, 360, 180)

    def __call__(self, coords, xp=np):
        pts = np.asarray(coords, np.float64) + np.asarray([180.0, 90.0])
        img = self.grid
        rows, cols = img.shape[1], img.shape[2]
        fl = np.floor(pts).astype(np.int64)
        ce = np.ceil(pts).astype(np.int64)
        frac = pts - fl
        fl[:, 0] = np.clip(fl[:, 0], 0, rows - 1)
        fl[:, 1] = np.clip(fl[:, 1], 0, cols - 1)
        ce[:, 0] = np.clip(ce[:, 0], 0, rows - 1)
        ce[:, 1] = np.clip(ce[:, 1], 0, cols - 1)
        floor_px = img[:, fl[:, 0], fl[:, 1]]            # (F, B)
        ceil_px = img[:, ce[:, 0], ce[:, 1]]
        w_floor = (1 - frac[:, 0]) * (1 - frac[:, 1])
        w_ceil = frac[:, 0] * (1 - frac[:, 1])
        out = (floor_px * w_floor[None] + ceil_px * w_ceil[None]).T
        return xp.asarray(out)


class WeightedSphericalHarmonics(_nn.Module):
    """Trainable SH encoding (reference
    ``positional_encoding/spherical_harmonics_weighted.py``): the raw SH
    basis is mixed into an ``embedding_dim``-wide output by a learnable
    (L, M, E) coefficient tensor with the reference's triangular storage —
    including its negative-index quirk ``get_coeffs(l, m<0) = weight[-l, m]``
    (python wrap-around, replicated verbatim).

    NOTE: dead code upstream — not exported from the reference's
    ``positional_encoding/__init__`` and unreachable from
    ``get_positional_encoding`` (and its SH import is the missing generated
    ylm blob).  Ported for completeness; being trainable, it is a flax
    module (runs inside jit with the closed-form SH basis), unlike the
    frozen host-side encodings above."""

    legendre_polys: int = 10
    embedding_dim: int = 16

    @_nn.compact
    def __call__(self, lonlat):
        import jax.numpy as jnp

        L = int(self.legendre_polys)
        weight = self.param("weight", _nn.initializers.normal(0.33),
                            (L, L, self.embedding_dim))
        # C[idx(l, m), e] with idx following sh_features' (l, m) ordering
        rows = []
        for l in range(L):
            for m in range(-l, l + 1):
                if m >= 0:
                    rows.append(weight[l, m])
                else:  # reference: self.weight[-l, m] — wrap-around indexing
                    rows.append(weight[-l, m])
        cmat = jnp.stack(rows)                       # (L², E)
        feats = sh_features(jnp.asarray(lonlat, jnp.float32), L,
                            "closed-form", xp=jnp)
        return feats.astype(cmat.dtype) @ cmat


def get_positional_encoding(name: str, legendre_polys: int = 10,
                            harmonics_calculation: str = "analytic",
                            min_radius: float = 1, max_radius: float = 360,
                            frequency_num: int = 10):
    """String dispatch (reference ``location_encoder.py:216-239``)."""
    if name == "direct":
        return Direct()
    if name == "cartesian3d":
        return Cartesian3D()
    if name == "sphericalharmonics":
        if harmonics_calculation == "discretized":
            return DiscretizedSphericalHarmonics(legendre_polys=legendre_polys)
        return SphericalHarmonics(legendre_polys=legendre_polys,
                                  harmonics_calculation=harmonics_calculation)
    if name == "theory":
        return Theory(min_radius=min_radius, max_radius=max_radius,
                      frequency_num=frequency_num)
    if name == "wrap":
        return Wrap()
    if name in ("grid", "spherec", "spherecplus", "spherem", "spheremplus"):
        return GridAndSphere(min_radius=min_radius, max_radius=max_radius,
                             frequency_num=frequency_num, name=name)
    raise ValueError(f"{name} not a known positional encoding.")
