"""SatCLIP wrapper: the user-facing "coords → 256-d embedding" handle
(reference ``SatClIP_wrapper`` at ``model/satclip/satclip_wrapper.py:7-38``
and ``get_satclip`` at ``load.py:3-17``).

Loads a torch Lightning SatCLIP checkpoint when available (reading its
``hyper_parameters`` for architecture, as the reference loader does) and
falls back to a reference-architecture random initialisation otherwise —
the checkpoint itself is a missing large blob in the public snapshot
(SURVEY.md §0.1).
"""

from __future__ import annotations

import os
import warnings

import numpy as np

from nirgan_tpu.models.satclip.location_encoder import LocationEncoder

__all__ = ["SatClipWrapper", "get_satclip_loc_encoder"]


def _load_native_pretrain(path: str) -> LocationEncoder:
    """Rebuild the frozen location encoder from a native `pretrain_satclip.py`
    orbax checkpoint — the workflow the reference runs with torch Lightning
    (pretrain SatCLIP → feed its location tower to the GAN, ``load.py:3-17``)
    done entirely in this stack.  Only the siren/sphericalharmonics family
    maps onto the frozen float64 host encoder."""
    import json

    import orbax.checkpoint as ocp

    p = path.rstrip("/")
    hp_file = os.path.join(p, "satclip_hparams.json")
    if os.path.isdir(os.path.join(p, "satclip_ckpt")):
        p = os.path.join(p, "satclip_ckpt")
    else:
        # orbax dir given directly; sidecar lives next to it
        hp_file = os.path.join(os.path.dirname(p), "satclip_hparams.json")
    hp = {}
    if os.path.exists(hp_file):
        with open(hp_file) as f:
            hp = json.load(f)
    if hp and (hp.get("le_type", "sphericalharmonics") != "sphericalharmonics"
               or hp.get("pe_type", "siren") != "siren"):
        raise NotImplementedError(
            "native SatCLIP checkpoint uses "
            f"{hp.get('le_type')}/{hp.get('pe_type')}; only the reference's "
            "sphericalharmonics/siren family loads into the frozen encoder")
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(p))
    nnet = restored.get("nnet", restored)
    layers = []
    i = 0
    while f"layers_{i}" in nnet:
        layers.append((np.asarray(nnet[f"layers_{i}"]["kernel"], np.float64),
                       np.asarray(nnet[f"layers_{i}"]["bias"], np.float64)))
        i += 1
    last = (np.asarray(nnet["last_layer"]["kernel"], np.float64),
            np.asarray(nnet["last_layer"]["bias"], np.float64))
    import math

    enc = LocationEncoder(
        num_layers=i,
        dim_hidden=layers[0][0].shape[1] if layers else 256,
        embed_dim=last[0].shape[1],
        legendre_polys=int(hp.get("legendre_polys")
                           or round(math.sqrt(layers[0][0].shape[0]))),
        convention="analytic"
        if hp.get("harmonics_calculation", "analytic") == "analytic"
        else "closed-form")
    enc.weights = layers + [last]
    return enc


def get_satclip_loc_encoder(ckpt_path: str, seed: int = 0) -> LocationEncoder:
    """Lightweight loader (reference ``load_lightweight.py:5-35``): read
    ``hyper_parameters`` + the ``nnet``-only state_dict from a Lightning
    SatCLIP checkpoint and return just the frozen location encoder."""
    return SatClipWrapper(ckpt_path, seed=seed).encoder


class SatClipWrapper:
    def __init__(self, satclip_path: str | None = None, seed: int = 0):
        self.loaded_from = None
        if satclip_path and os.path.isdir(satclip_path):
            # a NATIVE pretrain checkpoint (pretrain_satclip.py output):
            # either the run dir (containing satclip_ckpt + the hparams
            # sidecar) or the orbax dir itself
            self.encoder = _load_native_pretrain(satclip_path)
            self.loaded_from = satclip_path
        elif satclip_path and os.path.exists(satclip_path):
            from nirgan_tpu.train.torch_convert import load_torch_state_dict
            import torch

            ckpt = torch.load(satclip_path, map_location="cpu", weights_only=False)
            hp = ckpt.get("hyper_parameters", {})
            sd = {k: np.asarray(v.cpu().numpy())
                  for k, v in ckpt.get("state_dict", {}).items()}
            self.encoder = LocationEncoder.from_torch_state_dict(
                sd,
                convention="analytic"
                if hp.get("harmonics_calculation", "analytic") == "analytic"
                else "closed-form",
            )
            self.loaded_from = satclip_path
        else:
            if satclip_path:
                warnings.warn(
                    f"SatCLIP checkpoint not found at {satclip_path!r}; "
                    "using a randomly-initialised reference-architecture "
                    "location encoder (embeddings will not match published "
                    "checkpoints)."
                )
            self.encoder = LocationEncoder.create(seed=seed)

    def predict(self, coords) -> np.ndarray:
        """(B, 2) lon/lat → (B, embed_dim) float32.  Float64 compute on host,
        mirroring the reference's ``.double()`` path (satclip_wrapper.py:31)."""
        return self.encoder.encode(np.asarray(coords))

    @property
    def embed_dim(self) -> int:
        return self.encoder.embed_dim
