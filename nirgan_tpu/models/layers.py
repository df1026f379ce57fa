"""Building-block linen modules with torch-parity numerics (NHWC).

Weight/bias naming is flat and explicit so the torch→JAX checkpoint converter
(`nirgan_tpu/train/checkpoint.py`) can map reference state_dicts mechanically.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from nirgan_tpu.ops.conv import conv2d, conv_transpose2d
from nirgan_tpu.ops.norm import instance_norm
from nirgan_tpu.ops import initializers as inits


def dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name] if isinstance(name, str) else name


class TorchConv(nn.Module):
    """torch ``nn.Conv2d`` (explicit int padding)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = inits.normal(0.02)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, self.kernel_size, cin, self.features),
            self.param_dtype,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if return_params:
            # Param-only access for fused-layout callers (ops/blocked_stem.py)
            # — keeps the checkpoint-converter param paths unchanged.
            return k, b
        return conv2d(x, k, b, stride=self.stride, padding=self.padding)


class TorchConvTranspose(nn.Module):
    """torch ``nn.ConvTranspose2d`` (kernel stored (kh, kw, Cin, Cout))."""

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = inits.normal(0.02)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, self.kernel_size, cin, self.features),
            self.param_dtype,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        return conv_transpose2d(
            x, k, b, stride=self.stride, padding=self.padding, output_padding=self.output_padding
        )


class TorchDense(nn.Module):
    """torch ``nn.Linear`` (kernel stored (in, out))."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = inits.normal(0.02)
    bias_init: Callable = nn.initializers.zeros
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype)
        y = x @ k.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            y = y + b.astype(y.dtype)
        return y


class Norm(nn.Module):
    """Norm-layer dispatch mirroring reference ``get_norm_layer``
    (``model/networks.py:18-36``): batch | instance | none.

    - instance: affine-free, no running stats (parameter-free).
    - batch: affine + running stats (torch defaults: eps 1e-5, momentum 0.1).
    - none: identity.
    """

    norm_type: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_type == "instance":
            return instance_norm(x)
        if self.norm_type == "batch":
            bn = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                scale_init=inits.batchnorm_scale_init,
                name="bn",
            )
            return bn(x).astype(x.dtype)
        if self.norm_type == "none":
            return x
        raise NotImplementedError(f"normalization layer [{self.norm_type}] is not found")


def use_bias_for(norm_type: str) -> bool:
    """Reference quirk: conv bias is enabled only under InstanceNorm
    (``model/networks.py:336-339``) — BatchNorm has its own shift, and the
    'none' branch returns a factory *function* so the equality check fails and
    bias stays off there too."""
    return norm_type == "instance"
