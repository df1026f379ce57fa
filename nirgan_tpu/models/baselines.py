"""Baseline RGB→NIR regressors (reference ``model/baseline_models.py``):
per-pixel Linear (3→1), per-pixel MLP (3→64→64→1), 3-layer CNN
(3→32→64→1, 3×3).  All share the universal batch-dict contract and train
with plain MSE (``baseline_models.py:28``).

Per-pixel Linear/MLP are expressed as 1×1 convs — identical maths to the
reference's reshape-to-rows trick (``baseline_models.py:20-23``) but they
stay NHWC and fuse on the MXU.  Init matches torch's Linear/Conv default
(kaiming-uniform a=√5 ⇒ U(±1/√fan_in) for weight and bias).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nirgan_tpu.models.layers import TorchConv

__all__ = ["LinearNIR", "MLPNIR", "CNNNIR", "build_baseline"]


def torch_default_init(key, shape, dtype=jnp.float32):
    if len(shape) == 4:
        fan_in = shape[0] * shape[1] * shape[2]
    else:
        fan_in = shape[0]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LinearNIR(nn.Module):
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        return TorchConv(1, 1, kernel_init=torch_default_init, name="linear")(x)


class MLPNIR(nn.Module):
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        x = nn.relu(TorchConv(64, 1, kernel_init=torch_default_init, name="fc0")(x))
        x = nn.relu(TorchConv(64, 1, kernel_init=torch_default_init, name="fc1")(x))
        return TorchConv(1, 1, kernel_init=torch_default_init, name="fc2")(x)


class CNNNIR(nn.Module):
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        x = nn.relu(TorchConv(32, 3, padding=1, kernel_init=torch_default_init, name="conv0")(x))
        x = nn.relu(TorchConv(64, 3, padding=1, kernel_init=torch_default_init, name="conv1")(x))
        return TorchConv(1, 3, padding=1, kernel_init=torch_default_init, name="conv2")(x)


def build_baseline(model_name: str, compute_dtype=jnp.float32):
    """String dispatch mirroring the reference CLI (``train.py:51-58``)."""
    if model_name == "Linear_NIR":
        return LinearNIR(compute_dtype=compute_dtype)
    if model_name == "MLP_NIR":
        return MLPNIR(compute_dtype=compute_dtype)
    if model_name == "CNN_NIR":
        return CNNNIR(compute_dtype=compute_dtype)
    raise ValueError("Invalid Model Name")
