"""Remote-sensing spectral-index losses (NHWC).

Re-derivation of the reference's ``RemoteSensingIndices``
(``utils/remote_sensing_indices.py:4-319``): six indices computed from
(rgb, nir, nir_pred), compared with L1 or L2 between the true-NIR and
predicted-NIR index images.  All documented quirks are preserved on purpose
so loss values are bit-comparable:

  * eps = 1e-6 in ``loss`` mode, exactly 0 in ``index`` mode (``:105``) —
    only for NDVI/NDWI; GNDVI and SAVI never use an eps (``:185-190,226``);
    EVI adds 1e-6 to the full product denominator in loss mode (``:305``).
  * EVI uses the reference's (nonstandard) denominator
    ``(NIR + C1) * (R − C2) * (B + L)`` with L,C1,C2,G = 1, 6, 7.5, 2.5
    (``:296,305-315``).
  * GNDVI divides by ``NDVI + GREEN`` (``:189``), as written there.
  * MSAVI = (2·NIR + 1 − √((2·NIR+1)² − 8·(NIR − R))) / 2 (``:264``).

Arrays: rgb (B,H,W,3); nir / nir_pred (B,H,W,1).  3-D inputs get a batch dim
(mirrors ``prepare_tensor_for_loss``, ``:74-81``).
"""

from __future__ import annotations

import jax.numpy as jnp

from nirgan_tpu.losses.pixel import l1_loss, mse_loss

LOG_NAMES = {
    "lambda_ndvi": "indices_loss/ndvi_error",
    "lambda_ndwi": "indices_loss/ndwi_error",
    "lambda_gndvi": "indices_loss/gndvi_error",
    "lambda_savi": "indices_loss/savi_error",
    "lambda_msavi": "indices_loss/msavi_error",
    "lambda_evi": "indices_loss/evi_error",
}

DEFAULT_WEIGHTS = {
    "lambda_ndvi": 0.333,
    "lambda_ndwi": 0.333,
    "lambda_evi": 0.333,
    "lambda_savi": 0.0,
    "lambda_msavi": 0.0,
    "lambda_gndvi": 0.0,
}


def _prep(rgb, nir, nir_pred):
    if rgb.ndim == 3:
        rgb = rgb[None]
    if nir.ndim == 3:
        nir = nir[None]
    if nir_pred.ndim == 3:
        nir_pred = nir_pred[None]
    return (rgb.astype(jnp.float32), nir.astype(jnp.float32),
            nir_pred.astype(jnp.float32))


class RemoteSensingIndices:
    """mode: 'loss' (scalar criterion) or 'index' (return index image pair)."""

    def __init__(self, mode: str = "loss", criterion: str = "l1",
                 eps: float | None = None):
        if mode not in ("loss", "index"):
            raise AssertionError(
                f"Mode '{mode}' not implemented. 'loss', 'index' are supported.")
        self.mode = mode
        self.eps_override = eps
        if criterion == "l1":
            self.criterion = l1_loss
        elif criterion == "l2":
            self.criterion = mse_loss
        else:
            raise NotImplementedError(
                f"Criterion '{criterion}' not implemented. 'l1' or 'l2' are supported.")

    # -- shared plumbing ---------------------------------------------------
    def _finish(self, idx_true, idx_pred):
        if self.mode == "loss":
            return self.criterion(idx_true, idx_pred)
        return idx_true, idx_pred

    @property
    def _eps(self):
        if self.eps_override is not None:
            return self.eps_override
        return 1e-6 if self.mode == "loss" else 0.0

    # -- indices -----------------------------------------------------------
    def ndvi_calculation(self, rgb, nir, nir_pred):
        """(NIR − R) / (NIR + R [+ eps])."""
        rgb, nir, nir_pred = _prep(rgb, nir, nir_pred)
        red = rgb[..., 0:1]
        return self._finish((nir - red) / (nir + red + self._eps),
                            (nir_pred - red) / (nir_pred + red + self._eps))

    def ndwi_calculation(self, rgb, nir, nir_pred):
        """(NIR − G) / (NIR + G [+ eps])."""
        rgb, nir, nir_pred = _prep(rgb, nir, nir_pred)
        green = rgb[..., 1:2]
        return self._finish((nir - green) / (nir + green + self._eps),
                            (nir_pred - green) / (nir_pred + green + self._eps))

    def gndvi_calculation(self, rgb, nir, nir_pred):
        """(NIR − G) / (NDVI + G) — reference formula as written (:189)."""
        rgb, nir, nir_pred = _prep(rgb, nir, nir_pred)
        red, green = rgb[..., 0:1], rgb[..., 1:2]
        ndvi = (nir - red) / (nir + red)
        ndvi_pred = (nir_pred - red) / (nir_pred + red)
        return self._finish((nir - green) / (ndvi + green),
                            (nir_pred - green) / (ndvi_pred + green))

    def savi_calculation(self, rgb, nir, nir_pred):
        """(1 + L)·(NIR − R)/(NIR + R + L), L = 0.5."""
        rgb, nir, nir_pred = _prep(rgb, nir, nir_pred)
        red = rgb[..., 0:1]
        return self._finish(1.5 * (nir - red) / (nir + red + 0.5),
                            1.5 * (nir_pred - red) / (nir_pred + red + 0.5))

    def msavi_calculation(self, rgb, nir, nir_pred):
        rgb, nir, nir_pred = _prep(rgb, nir, nir_pred)
        red = rgb[..., 0:1]

        def msavi(n):
            return (2 * n + 1 - jnp.sqrt((2 * n + 1) ** 2 - 8 * (n - red))) / 2

        return self._finish(msavi(nir), msavi(nir_pred))

    def evi_calculation(self, rgb, nir, nir_pred):
        l, c1, c2, g = 1.0, 6.0, 7.5, 2.5
        rgb, nir, nir_pred = _prep(rgb, nir, nir_pred)
        red, blue = rgb[..., 0:1], rgb[..., 2:3]
        eps = self._eps
        denom = (nir + c1) * (red - c2) * (blue + l) + eps
        denom_pred = (nir_pred + c1) * (red - c2) * (blue + l) + eps
        return self._finish(g * (nir - red) / denom, g * (nir_pred - red) / denom_pred)

    # -- aggregation ---------------------------------------------------------
    def get_and_weight_losses(self, rgb, nir, nir_pred, loss_config=None,
                              mode: str = "loss"):
        """Weighted sum ('loss') or per-index dict ('logging_dict') —
        reference ``:23-71``."""
        if loss_config is None:
            loss_config = DEFAULT_WEIGHTS
        fns = {
            "lambda_ndvi": self.ndvi_calculation,
            "lambda_ndwi": self.ndwi_calculation,
            "lambda_gndvi": self.gndvi_calculation,
            "lambda_savi": self.savi_calculation,
            "lambda_msavi": self.msavi_calculation,
            "lambda_evi": self.evi_calculation,
        }
        if mode == "loss":
            total = 0.0
            for key, fn in fns.items():
                weight = float(loss_config.get(key, 0.0))
                if weight > 0.0:
                    total = total + weight * fn(rgb, nir, nir_pred)
            return total
        if mode == "logging_dict":
            return {LOG_NAMES[key]: fn(rgb, nir, nir_pred) for key, fn in fns.items()}
        raise NotImplementedError(
            f"Mode '{mode}' not implemented. 'loss' or 'logging_dict' are supported.")
