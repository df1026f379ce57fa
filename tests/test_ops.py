"""Op-level torch parity: conv, conv-transpose, instance norm, padding,
resize.  Torch (CPU) is the golden oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from nirgan_tpu.ops import (
    conv2d,
    conv_transpose2d,
    instance_norm,
    reflect_pad2d,
    resize_bilinear,
    resize_bicubic,
)

RTOL, ATOL = 1e-5, 1e-5


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def _nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


@pytest.mark.parametrize("stride,padding,k", [(1, 0, 7), (2, 1, 3), (1, 1, 3), (2, 1, 4), (1, 1, 4)])
def test_conv2d_matches_torch(stride, padding, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 17, 5), dtype=np.float32)
    w_oihw = rng.standard_normal((7, 5, k, k), dtype=np.float32)
    b = rng.standard_normal(7, dtype=np.float32)

    ref = F.conv2d(torch.from_numpy(_nchw(x)), torch.from_numpy(w_oihw),
                   torch.from_numpy(b), stride=stride, padding=padding).numpy()

    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    out = conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                 stride=stride, padding=padding)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,padding,op,k", [(2, 1, 1, 3), (2, 1, 0, 4), (2, 1, 1, 4)])
def test_conv_transpose2d_matches_torch(stride, padding, op, k):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 11, 6), dtype=np.float32)
    w_iohw = rng.standard_normal((6, 4, k, k), dtype=np.float32)  # torch (Cin, Cout, kh, kw)
    b = rng.standard_normal(4, dtype=np.float32)

    ref = F.conv_transpose2d(torch.from_numpy(_nchw(x)), torch.from_numpy(w_iohw),
                             torch.from_numpy(b), stride=stride, padding=padding,
                             output_padding=op).numpy()

    w_hwio = np.transpose(w_iohw, (2, 3, 0, 1))
    out = conv_transpose2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                           stride=stride, padding=padding, output_padding=op)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=RTOL, atol=ATOL)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 16, 16, 8), dtype=np.float32) * 3 + 1
    ref = F.instance_norm(torch.from_numpy(_nchw(x))).numpy()
    out = instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=1e-5)


def test_reflect_pad_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 9, 2), dtype=np.float32)
    ref = F.pad(torch.from_numpy(_nchw(x)), (3, 3, 3, 3), mode="reflect").numpy()
    out = reflect_pad2d(jnp.asarray(x), 3)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=0, atol=0)


@pytest.mark.parametrize("out_hw", [(128, 128), (133, 133), (37, 53), (512, 512), (16, 16)])
def test_resize_bilinear_matches_torch(out_hw):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    ref = F.interpolate(torch.from_numpy(_nchw(x)), size=out_hw, mode="bilinear",
                        align_corners=False).numpy()
    out = resize_bilinear(jnp.asarray(x), *out_hw)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(256, 256), (100, 100), (31, 67)])
def test_resize_bicubic_matches_torch(out_hw):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 48, 48, 4), dtype=np.float32)
    ref = F.interpolate(torch.from_numpy(_nchw(x)), size=out_hw, mode="bicubic",
                        align_corners=False).numpy()
    out = resize_bicubic(jnp.asarray(x), *out_hw)
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-3, atol=1e-4)
