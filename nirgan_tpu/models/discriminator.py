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
    # Space-to-depth first two layers (ops/blocked_stem.py
    # disc_stem_blocked): the 4-5-channel 4×4/s2 conv0 underfeeds the MXU
    # in isolation (isolated D-fwd 22.35 → 5.36 ms, 4.2×, b32@256² bf16)
    # but the REAL fused GAN step is unchanged (121.8 vs 122.1 ms,
    # benchmarks/dstem_ab.py round 5) — XLA's in-context layout never had
    # the starvation the isolated probe showed.  Math-identical and fully
    # tested; default OFF per the measured-A/B convention (the isolated
    # win matters only for a standalone-D serving path, which has no use
    # case here).
    blocked_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = use_bias_for(self.norm_type)
        kw = dict(kernel_init=self.kernel_init, param_dtype=self.param_dtype)
        h = x.astype(self.compute_dtype)

        conv0 = TorchConv(self.ndf, 4, stride=2, padding=1, use_bias=True,
                          name="conv0", **kw)
        start_n = 1
        use_blocked = (
            self.blocked_stem
            and self.n_layers >= 2
            and h.shape[1] % 4 == 0
            and h.shape[2] % 4 == 0
        )
        if use_blocked:
            from nirgan_tpu.ops.blocked_stem import disc_stem_blocked

            k1, b1 = conv0(h, return_params=True)
            conv1 = TorchConv(self.ndf * 2, 4, stride=2, padding=1,
                              use_bias=use_bias, name="conv1", **kw)
            # param-only call: only the trailing dim of the dummy is read
            k2, b2 = conv1(jnp.zeros((1, 1, 1, self.ndf), h.dtype),
                           return_params=True)
            h = disc_stem_blocked(h, k1, b1, k2, b2)
            h = Norm(self.norm_type, name="norm1")(h, train)
            h = nn.leaky_relu(h, 0.2)
            start_n = 2
        else:
            h = conv0(h)
            h = nn.leaky_relu(h, 0.2)

        for n in range(start_n, self.n_layers):
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
