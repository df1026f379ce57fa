"""U-Net generator (reference ``model/networks.py:437-536``).

Built iteratively from the innermost block outwards, mirroring the torch
recursion: outermost [conv ↓ | sub | relu, convT ↑, tanh], middle blocks
[lrelu, conv ↓, norm | sub | relu, convT ↑, norm (, dropout)], innermost
[lrelu, conv ↓ | relu, convT ↑, norm]; every non-outermost block concatenates
its input with its output along channels.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from nirgan_tpu.models.layers import Norm, TorchConv, TorchConvTranspose, use_bias_for
from nirgan_tpu.ops import initializers as inits


class UnetSkipConnectionBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    outermost: bool = False
    innermost: bool = False
    norm_type: str = "instance"
    use_dropout: bool = False
    depth_below: int = 0  # number of nested blocks below this one
    ngf: int = 64
    num_downs: int = 8
    kernel_init: Callable = inits.normal(0.02)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = use_bias_for(self.norm_type)
        kw = dict(kernel_init=self.kernel_init, param_dtype=self.param_dtype)
        input_nc = self.input_nc if self.input_nc is not None else self.outer_nc

        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        h = TorchConv(
            self.inner_nc, 4, stride=2, padding=1,
            use_bias=True if self.outermost else use_bias, name="down", **kw,
        )(h)
        if not (self.outermost or self.innermost):
            h = Norm(self.norm_type, name="downnorm")(h, train)

        if not self.innermost:
            h = _make_submodule(self, train)(h)

        h = nn.relu(h)
        h = TorchConvTranspose(
            self.outer_nc, 4, stride=2, padding=1, output_padding=0,
            use_bias=True if self.outermost else use_bias, name="up", **kw,
        )(h)
        if self.outermost:
            return jnp.tanh(h)
        h = Norm(self.norm_type, name="upnorm")(h, train)
        if self.use_dropout and not self.innermost:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


def _make_submodule(blk: UnetSkipConnectionBlock, train: bool):
    """Instantiate the next-inner block, reproducing the torch construction
    (reference ``model/networks.py:454-462``)."""
    ngf, num_downs = blk.ngf, blk.num_downs
    d = blk.depth_below
    n_mid = num_downs - 5  # blocks at ngf*8 ↔ ngf*8 between innermost and ramp
    if d == 1:
        sub = UnetSkipConnectionBlock(
            ngf * 8, ngf * 8, innermost=True, norm_type=blk.norm_type,
            depth_below=0, ngf=ngf, num_downs=num_downs,
            kernel_init=blk.kernel_init, param_dtype=blk.param_dtype, name="sub",
        )
    elif d <= 1 + n_mid:
        sub = UnetSkipConnectionBlock(
            ngf * 8, ngf * 8, norm_type=blk.norm_type, use_dropout=blk.use_dropout,
            depth_below=d - 1, ngf=ngf, num_downs=num_downs,
            kernel_init=blk.kernel_init, param_dtype=blk.param_dtype, name="sub",
        )
    else:
        ramp = d - 1 - n_mid  # 1, 2, 3 → ngf*4, ngf*2, ngf ramp positions
        mult = 2 ** (3 - ramp)
        sub = UnetSkipConnectionBlock(
            ngf * mult, ngf * mult * 2, norm_type=blk.norm_type,
            depth_below=d - 1, ngf=ngf, num_downs=num_downs,
            kernel_init=blk.kernel_init, param_dtype=blk.param_dtype, name="sub",
        )
    return lambda h: sub(h, train)


class UnetGenerator(nn.Module):
    """U-Net with ``num_downs`` stride-2 levels (unet_128 → 7, unet_256 → 8)."""

    input_nc: int
    output_nc: int
    num_downs: int
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    kernel_init: Callable = inits.normal(0.02)
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embeds=None, train: bool = False):
        del embeds  # U-Net has no injection path (reference define_G_inject
        # supports resnet_9blocks only, generator_inject.py:188-199)
        h = x.astype(self.compute_dtype)
        return UnetSkipConnectionBlock(
            self.output_nc,
            self.ngf,
            input_nc=self.input_nc,
            outermost=True,
            norm_type=self.norm_type,
            use_dropout=self.use_dropout,
            depth_below=self.num_downs - 1,
            ngf=self.ngf,
            num_downs=self.num_downs,
            kernel_init=self.kernel_init,
            param_dtype=self.param_dtype,
            name="unet",
        )(h, train)
