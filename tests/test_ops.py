"""Op-level torch parity: conv, conv-transpose, instance norm, padding,
resize.  Torch (CPU) is the golden oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
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


@pytest.mark.parametrize("hw", [(32, 48), (276, 276)])
def test_blocked_stem_matches_unblocked_chain(hw):
    """ops/blocked_stem.py: space-to-depth stem→IN→ReLU→d0 pipeline is
    math-identical to the unblocked op chain (fp reassociation only)."""
    from nirgan_tpu.ops.blocked_stem import (
        depth_to_space2,
        space_to_depth2,
        stem_downsample_blocked,
    )
    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.norm import instance_norm

    rng = np.random.default_rng(11)
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h + 6, w + 6, 3)).astype(np.float32))
    k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 16)).astype(np.float32)) * 0.1
    b7 = jnp.asarray(rng.standard_normal((16,)).astype(np.float32)) * 0.1
    k3 = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32)) * 0.1
    b3 = jnp.asarray(rng.standard_normal((32,)).astype(np.float32)) * 0.1

    ref = conv2d(x, k7, b7)
    ref = instance_norm(ref)
    ref = jnp.maximum(ref, 0)
    ref = conv2d(ref, k3, b3, stride=2, padding=1)
    got = stem_downsample_blocked(x, k7, b7, k3, b3)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)

    # round-trip of the layout transform itself
    y = jnp.asarray(rng.standard_normal((1, 8, 10, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space2(space_to_depth2(y))), np.asarray(y))


def test_blocked_stem_gradients_match():
    """The blocked pipeline must also backprop identically (it is on the
    training path of the generator)."""
    from nirgan_tpu.ops.blocked_stem import stem_downsample_blocked
    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.norm import instance_norm

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 22, 22, 3)).astype(np.float32))
    k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 8)).astype(np.float32)) * 0.1
    b7 = jnp.zeros((8,), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32)) * 0.1
    b3 = jnp.zeros((16,), jnp.float32)

    def loss_ref(k7, k3, x):
        h = conv2d(x, k7, b7)
        h = instance_norm(h)
        h = jnp.maximum(h, 0)
        return jnp.sum(jnp.square(conv2d(h, k3, b3, stride=2, padding=1)))

    def loss_blk(k7, k3, x):
        return jnp.sum(jnp.square(stem_downsample_blocked(x, k7, b7, k3, b3)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(k7, k3, x)
    g_blk = jax.grad(loss_blk, argnums=(0, 1, 2))(k7, k3, x)
    for a, b in zip(g_ref, g_blk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw", [(32, 48), (64, 64)])
def test_disc_stem_blocked_matches_unblocked_chain(hw):
    """ops/blocked_stem.py disc_stem_blocked: the space-to-depth first two
    PatchGAN layers (conv 4×4/s2 → LeakyReLU → conv 4×4/s2) equal the
    unblocked chain, forward and backward."""
    from nirgan_tpu.ops.blocked_stem import disc_stem_blocked
    from nirgan_tpu.ops.conv import conv2d

    rng = np.random.default_rng(14)
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h, w, 5)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((4, 4, 5, 8)).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.standard_normal((8,)).astype(np.float32)) * 0.1
    k2 = jnp.asarray(rng.standard_normal((4, 4, 8, 16)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.standard_normal((16,)).astype(np.float32)) * 0.1

    def chain(x, k1, k2):
        y = conv2d(x, k1, b1, stride=2, padding=1)
        y = jnp.where(y >= 0, y, 0.2 * y)
        return conv2d(y, k2, b2, stride=2, padding=1)

    ref = chain(x, k1, k2)
    got = disc_stem_blocked(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(jnp.square(chain(*a))),
                     argnums=(0, 1, 2))(x, k1, k2)
    g_blk = jax.grad(
        lambda x, k1, k2: jnp.sum(jnp.square(disc_stem_blocked(x, k1, b1,
                                                               k2, b2))),
        argnums=(0, 1, 2))(x, k1, k2)
    for a, b in zip(g_ref, g_blk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_nlayer_discriminator_blocked_equivalence():
    """NLayerDiscriminator blocked_stem on/off: identical logits and
    parameter gradients (same param tree — checkpoint-compatible)."""
    from nirgan_tpu.models.discriminator import NLayerDiscriminator

    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
    m_blk = NLayerDiscriminator(input_nc=4, ndf=8, blocked_stem=True)
    m_ref = NLayerDiscriminator(input_nc=4, ndf=8)  # default: plain chain
    params = m_ref.init(jax.random.PRNGKey(0), x[:1])
    assert jax.tree_util.tree_structure(
        m_blk.init(jax.random.PRNGKey(0), x[:1])) == \
        jax.tree_util.tree_structure(params)
    y_ref = m_ref.apply(params, x)
    y_blk = m_blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_ref),
                               rtol=0, atol=2e-5)

    ct = jnp.asarray(rng.standard_normal(y_ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply(p, x) * ct))(params)
    g_blk = jax.grad(lambda p: jnp.sum(m_blk.apply(p, x) * ct))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_blk),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # odd spatial size: auto-fallback to the plain chain
    x_odd = jnp.asarray(rng.standard_normal((1, 30, 30, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(m_blk.apply(params, x_odd)),
                               np.asarray(m_ref.apply(params, x_odd)),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("factor,hw,cin,cout", [(4, (24, 32), 8, 1), (2, (18, 26), 8, 3), (4, (276, 276), 4, 1)])
def test_conv_valid_blocked_matches_conv2d(factor, hw, cin, cout):
    """ops/blocked_stem.py conv_valid_blocked: the space-to-depth head conv
    equals the plain valid conv (and backprops identically)."""
    from nirgan_tpu.ops.blocked_stem import conv_valid_blocked
    from nirgan_tpu.ops.conv import conv2d

    rng = np.random.default_rng(13)
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h + 6, w + 6, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, cin, cout)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32)) * 0.1
    ref = conv2d(x, k, b)
    got = conv_valid_blocked(x, k, b, factor=factor)
    assert got.shape == ref.shape == (2, h, w, cout)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda k, x: jnp.sum(jnp.tanh(conv2d(x, k, b))), argnums=(0, 1))(k, x)
    g_blk = jax.grad(lambda k, x: jnp.sum(jnp.tanh(conv_valid_blocked(x, k, b, factor=factor))),
                     argnums=(0, 1))(k, x)
    for a, bb in zip(g_ref, g_blk):
        # grads accumulate over the whole image → large magnitudes; fp
        # reassociation is the only allowed difference
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(bb) / scale,
                                   rtol=0, atol=1e-5)
