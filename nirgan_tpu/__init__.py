"""nirgan-tpu: a TPU-native JAX framework with the capabilities of
simon-donike/NIR-GAN — RGB→NIR conditional-GAN training and serving with
optional SatCLIP geographic conditioning.

See README.md for layout, PARITY.md for the reference component mapping,
and benchmarks/RESULTS.md for measured performance.
"""

__version__ = "0.1.0"

from nirgan_tpu.config import load_config, save_config

__all__ = ["load_config", "save_config", "__version__"]
