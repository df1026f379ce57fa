"""SatCLIP location encoder: SH positional features → SIREN → embedding.

Rebuild of the reference stack (``model/satclip/location_encoder.py:73-151,
267-275``): a SirenNet whose first layer uses w0=30, hidden layers w0=1, and
whose last layer is a plain linear map (the torch ``Siren`` with Identity
activation).  Dropout exists only in train mode there; this encoder is used
frozen (reference runs it under ``no_grad`` in float64,
``satclip_wrapper.py:29-34``), so the forward here is deterministic.

Two execution paths share one parameter set:
  * ``encode`` — numpy float64 on host: exact reference numerics; this is
    what feeds the train step (embeddings enter the compiled step as plain
    array inputs, keeping the frozen tower out of the hot graph —
    SURVEY.md §7.1).
  * ``encode_jax`` — jnp float32: lets the predict path run fully jitted
    end-to-end on device when float32 is adequate (validated by test
    ``test_satclip.py::test_f32_vs_f64_adequacy``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Literal

import numpy as np

from nirgan_tpu.models.satclip.spherical_harmonics import embedding_dim, sh_features

__all__ = ["LocationEncoder", "siren_init"]


def siren_init(rng: np.random.Generator, dim_in: int, dim_out: int,
               is_first: bool, w0: float, c: float = 6.0):
    """torch Siren init (``location_encoder.py:137-144``): U(−s, s) with
    s = 1/dim_in for the first layer else sqrt(c/dim_in)/w0; bias same s."""
    s = (1.0 / dim_in) if is_first else (math.sqrt(c / dim_in) / w0)
    w = rng.uniform(-s, s, size=(dim_in, dim_out))
    b = rng.uniform(-s, s, size=(dim_out,))
    return w, b


@dataclass
class LocationEncoder:
    """Frozen (lon, lat) → R^embed_dim encoder."""

    legendre_polys: int = 10
    dim_hidden: int = 256
    num_layers: int = 2       # sine-activated layers before the linear head
    embed_dim: int = 256
    w0: float = 1.0
    w0_initial: float = 30.0
    convention: Literal["analytic", "closed-form"] = "analytic"
    weights: List[tuple] = field(default_factory=list)  # [(W(in,out), b), ...]

    # ------------------------------------------------------------------ init
    @classmethod
    def create(cls, seed: int = 0, **kw) -> "LocationEncoder":
        enc = cls(**kw)
        rng = np.random.default_rng(seed)
        dims = [embedding_dim(enc.legendre_polys)] + [enc.dim_hidden] * enc.num_layers
        ws = []
        for i in range(enc.num_layers):
            w0 = enc.w0_initial if i == 0 else enc.w0
            ws.append(siren_init(rng, dims[i], dims[i + 1], i == 0, w0))
        ws.append(siren_init(rng, enc.dim_hidden, enc.embed_dim, False, enc.w0))
        enc.weights = [(w.astype(np.float64), b.astype(np.float64)) for w, b in ws]
        return enc

    @classmethod
    def from_torch_state_dict(cls, sd, prefix: str = "model.location.nnet.",
                              **kw) -> "LocationEncoder":
        """Map reference SIREN keys (``layers.{i}.weight/bias`` +
        ``last_layer.weight/bias``, torch (out,in) layout) onto this encoder."""
        layers = []
        i = 0
        while f"{prefix}layers.{i}.weight" in sd:
            layers.append((np.asarray(sd[f"{prefix}layers.{i}.weight"], np.float64).T,
                           np.asarray(sd[f"{prefix}layers.{i}.bias"], np.float64)))
            i += 1
        last = (np.asarray(sd[f"{prefix}last_layer.weight"], np.float64).T,
                np.asarray(sd[f"{prefix}last_layer.bias"], np.float64))
        enc = cls(num_layers=i,
                  dim_hidden=layers[0][0].shape[1] if layers else 256,
                  embed_dim=last[0].shape[1],
                  legendre_polys=int(round(math.sqrt(layers[0][0].shape[0]))),
                  **kw)
        enc.weights = layers + [last]
        return enc

    # --------------------------------------------------------------- forward
    def _forward(self, x, xp):
        n = len(self.weights)
        for i, (w, b) in enumerate(self.weights):
            w0 = self.w0_initial if i == 0 else self.w0
            x = x @ xp.asarray(w, dtype=x.dtype) + xp.asarray(b, dtype=x.dtype)
            if i < n - 1:  # last layer has Identity activation
                x = xp.sin(w0 * x)
        return x

    def encode(self, lonlat) -> np.ndarray:
        """Host path: float64 in/out float32 (reference
        ``satclip_wrapper.py:29-34`` casts double → float)."""
        lonlat = np.asarray(lonlat, dtype=np.float64)
        feats = sh_features(lonlat, self.legendre_polys, self.convention, xp=np)
        return self._forward(feats, np).astype(np.float32)

    def encode_jax(self, lonlat):
        """Device path: float32, jit/vmap-compatible."""
        import jax.numpy as jnp

        feats = sh_features(lonlat.astype(jnp.float32), self.legendre_polys,
                            self.convention, xp=jnp)
        return self._forward(feats, jnp)

    def param_count(self) -> int:
        return sum(w.size + b.size for w, b in self.weights)
