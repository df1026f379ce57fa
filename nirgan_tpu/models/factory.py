"""Network factories mirroring the reference's string dispatch
(``define_G`` / ``define_D`` at ``model/networks.py:120-204`` and
``define_G_inject`` at ``model/generator_inject.py:145-200``).

These return *unbound* linen modules; parameter initialisation (the
reference's ``init_net``/``init_weights`` N(0, 0.02) step,
``model/networks.py:68-117``) happens through each module's ``kernel_init``,
so ``module.init(rng, x)`` produces reference-equivalent weight statistics.
"""

from __future__ import annotations

import jax.numpy as jnp

from nirgan_tpu.models.discriminator import NLayerDiscriminator, PixelDiscriminator
from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.models.unet import UnetGenerator
from nirgan_tpu.ops.initializers import get_initializer


def define_G(
    input_nc: int,
    output_nc: int,
    ngf: int,
    netG: str,
    norm: str = "batch",
    use_dropout: bool = False,
    init_type: str = "normal",
    init_gain: float = 0.02,
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
):
    """Create a generator: resnet_9blocks | resnet_6blocks | unet_256 | unet_128."""
    kernel_init = get_initializer(init_type, init_gain)
    kw = dict(kernel_init=kernel_init, compute_dtype=compute_dtype, param_dtype=param_dtype)
    if netG == "resnet_9blocks":
        return ResnetGenerator(input_nc, output_nc, ngf, norm_type=norm,
                               use_dropout=use_dropout, n_blocks=9, **kw)
    if netG == "resnet_6blocks":
        return ResnetGenerator(input_nc, output_nc, ngf, norm_type=norm,
                               use_dropout=use_dropout, n_blocks=6, **kw)
    if netG == "unet_128":
        return UnetGenerator(input_nc, output_nc, 7, ngf, norm_type=norm,
                             use_dropout=use_dropout, **kw)
    if netG == "unet_256":
        return UnetGenerator(input_nc, output_nc, 8, ngf, norm_type=norm,
                             use_dropout=use_dropout, **kw)
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")


def define_G_inject(config, compute_dtype=jnp.float32, param_dtype=jnp.float32):
    """SatCLIP-injection generator from a full config tree
    (reference ``model/generator_inject.py:145-200``; resnet_9blocks only)."""
    bc = config.base_configs
    sc = config.satclip
    if bc.netG != "resnet_9blocks":
        raise NotImplementedError(
            f"Generator model name [{bc.netG}] is not recognized. Only resnet_9blocks for SatCLIP."
        )
    return ResnetGenerator(
        bc.input_nc,
        bc.output_nc,
        bc.ngf,
        norm_type=bc.norm,
        use_dropout=not bc.no_dropout,
        n_blocks=9,
        inject=True,
        inject_style=sc.satclip_inject_style,
        scaling_param=sc.get("scaling_param", True),
        scaling_param_init=float(sc.get("scaling_param_init", 0.01)),
        post_correction=sc.get("post_correction", False),
        post_correction_init=float(sc.get("post_correction_init", 1.0)),
        kernel_init=get_initializer(bc.init_type, bc.init_gain),
        compute_dtype=compute_dtype,
        param_dtype=param_dtype,
    )


def define_D(
    input_nc: int,
    ndf: int,
    netD: str,
    n_layers_D: int = 3,
    norm: str = "batch",
    init_type: str = "normal",
    init_gain: float = 0.02,
    compute_dtype=jnp.float32,
    param_dtype=jnp.float32,
):
    """Create a discriminator: basic (70×70 PatchGAN) | n_layers | pixel."""
    kernel_init = get_initializer(init_type, init_gain)
    kw = dict(kernel_init=kernel_init, compute_dtype=compute_dtype, param_dtype=param_dtype)
    if netD == "basic":
        return NLayerDiscriminator(input_nc, ndf, n_layers=3, norm_type=norm, **kw)
    if netD == "n_layers":
        return NLayerDiscriminator(input_nc, ndf, n_layers=n_layers_D, norm_type=norm, **kw)
    if netD == "pixel":
        return PixelDiscriminator(input_nc, ndf, norm_type=norm, **kw)
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")
