"""PatchGAN discriminators (reference ``model/networks.py:539-616``)."""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from nirgan_tpu.models.layers import Norm, TorchConv, use_bias_for
from nirgan_tpu.ops import initializers as inits


class NLayerDiscriminator(nn.Module):
    """70×70 PatchGAN: C64-C128-C256-C512 → 1-channel logit map.

    Reference layer plan (``model/networks.py:557-580``): 4×4 convs; stride 2
    for the first ``n_layers`` convs, stride 1 for the last two; LeakyReLU 0.2;
    first and last convs always carry bias, the normed middle convs follow the
    InstanceNorm bias rule.
    """

    input_nc: int
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "instance"
    kernel_init: Callable = inits.normal(0.02)
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = use_bias_for(self.norm_type)
        kw = dict(kernel_init=self.kernel_init, param_dtype=self.param_dtype)
        h = x.astype(self.compute_dtype)

        h = TorchConv(self.ndf, 4, stride=2, padding=1, use_bias=True, name="conv0", **kw)(h)
        h = nn.leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = TorchConv(self.ndf * nf_mult, 4, stride=2, padding=1,
                          use_bias=use_bias, name=f"conv{n}", **kw)(h)
            h = Norm(self.norm_type, name=f"norm{n}")(h, train)
            h = nn.leaky_relu(h, 0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        h = TorchConv(self.ndf * nf_mult, 4, stride=1, padding=1,
                      use_bias=use_bias, name=f"conv{self.n_layers}", **kw)(h)
        h = Norm(self.norm_type, name=f"norm{self.n_layers}")(h, train)
        h = nn.leaky_relu(h, 0.2)

        h = TorchConv(1, 4, stride=1, padding=1, use_bias=True,
                      name=f"conv{self.n_layers + 1}", **kw)(h)
        return h


class PixelDiscriminator(nn.Module):
    """1×1 PixelGAN discriminator (reference ``model/networks.py:587-616``)."""

    input_nc: int
    ndf: int = 64
    norm_type: str = "instance"
    kernel_init: Callable = inits.normal(0.02)
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = use_bias_for(self.norm_type)
        kw = dict(kernel_init=self.kernel_init, param_dtype=self.param_dtype)
        h = x.astype(self.compute_dtype)
        h = TorchConv(self.ndf, 1, use_bias=True, name="conv0", **kw)(h)
        h = nn.leaky_relu(h, 0.2)
        h = TorchConv(self.ndf * 2, 1, use_bias=use_bias, name="conv1", **kw)(h)
        h = Norm(self.norm_type, name="norm1")(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = TorchConv(1, 1, use_bias=use_bias, name="conv2", **kw)(h)
        return h
