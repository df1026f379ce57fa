from nirgan_tpu.models.factory import define_G, define_D, define_G_inject
from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.models.unet import UnetGenerator
from nirgan_tpu.models.discriminator import NLayerDiscriminator, PixelDiscriminator

__all__ = [
    "define_G",
    "define_D",
    "define_G_inject",
    "ResnetGenerator",
    "UnetGenerator",
    "NLayerDiscriminator",
    "PixelDiscriminator",
]
