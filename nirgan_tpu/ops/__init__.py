"""TPU-native op layer.

NHWC-layout primitives with exact PyTorch numerical semantics, so converted
reference checkpoints reproduce outputs bit-for-visual-bit.  The hot ops map
straight onto the MXU (convs via ``lax.conv_general_dilated``) and the VPU
(norm/activations, fused by XLA); Pallas kernels live in ``ops/pallas_kernels``.
"""

from nirgan_tpu.ops.conv import conv2d, conv_transpose2d
from nirgan_tpu.ops.norm import instance_norm
from nirgan_tpu.ops.pad import reflect_pad2d
from nirgan_tpu.ops.resize import resize_bilinear, resize_bicubic
from nirgan_tpu.ops import initializers

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "instance_norm",
    "reflect_pad2d",
    "resize_bilinear",
    "resize_bicubic",
    "initializers",
]
