"""Pallas kernel correctness (interpret mode on CPU): fused instance norm
forward + custom-VJP backward vs the XLA implementation and torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nirgan_tpu.ops.pallas_kernels import fits_vmem, instance_norm_pallas


def _x(shape=(2, 16, 16, 8), seed=0, scale=3.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale + 1.5).astype(np.float32)


def test_forward_matches_torch():
    x = _x()
    ref = F.instance_norm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = np.asarray(instance_norm_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 1)), out,
                               rtol=1e-4, atol=1e-5)


def test_forward_channel_blocks():
    # C = 256 → two 128-lane blocks
    x = _x((1, 8, 8, 256), seed=1)
    ref = F.instance_norm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = np.asarray(instance_norm_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 1)), out,
                               rtol=1e-4, atol=1e-5)


def test_backward_matches_torch_autograd():
    x = _x((2, 12, 12, 4), seed=2)
    w = _x((2, 12, 12, 4), seed=3)

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    tw = torch.from_numpy(np.transpose(w, (0, 3, 1, 2)))
    (F.instance_norm(t) * tw).sum().backward()
    ref_grad = np.transpose(t.grad.numpy(), (0, 2, 3, 1))

    g = jax.grad(lambda a: jnp.sum(instance_norm_pallas(a) * jnp.asarray(w)))(
        jnp.asarray(x))
    np.testing.assert_allclose(ref_grad, np.asarray(g), rtol=1e-3, atol=1e-4)


def test_fits_vmem_gate():
    # in/out blocks are pipeline-double-buffered → 4×bytes per lane budget
    assert fits_vmem((8, 64, 64, 256), jnp.bfloat16)
    assert not fits_vmem((8, 133, 133, 256), jnp.bfloat16)  # 18 MB > VMEM
    assert not fits_vmem((8, 532, 532, 64), jnp.bfloat16)


def test_bf16_forward_reasonable():
    x = _x((1, 16, 16, 8), seed=4).astype(jnp.bfloat16)
    out = instance_norm_pallas(jnp.asarray(x))
    assert out.dtype == jnp.bfloat16
    o32 = np.asarray(out, np.float32)
    assert abs(o32.mean()) < 0.05 and abs(o32.std() - 1.0) < 0.05


@pytest.mark.parametrize("shape", [(2, 38, 46, 64), (1, 70, 70, 64)])
def test_pallas_head_conv_matches_conv2d(shape):
    """ops/pallas_head.py: the W-lane blocked-8 head kernel equals the plain
    valid conv (interpret mode on CPU; TPU-verified in RESULTS.md)."""
    from jax.experimental.pallas import tpu as pltpu

    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.pallas_head import head_conv_pallas, head_conv_supported

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, shape[-1], 1)).astype(np.float32)) * 0.1
    assert head_conv_supported(x.shape, k.shape)
    ref = conv2d(x, k)
    with pltpu.force_tpu_interpret_mode():
        got = head_conv_pallas(x, k)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=2e-5, atol=2e-5)


def test_pallas_head_conv_backward_matches():
    from jax.experimental.pallas import tpu as pltpu

    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.pallas_head import head_conv_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 30, 30, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 1)).astype(np.float32)) * 0.1

    def loss_ref(x, k):
        return jnp.sum(jnp.tanh(conv2d(x, k)))

    def loss_pl(x, k):
        return jnp.sum(jnp.tanh(head_conv_pallas(x, k)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    for a, b in zip(g_ref, g_pl):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   rtol=0, atol=1e-5)


def test_trunk_conv3x3_pallas_matches_xla():
    """ops/pallas_trunk.conv3x3_pallas (interpret mode on CPU; the TPU
    measurements that closed the trunk-fusion line are in RESULTS.md)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from nirgan_tpu.ops.pallas_trunk import conv3x3_pallas

    rng = np.random.default_rng(0)
    c = 256
    x = jnp.asarray(rng.standard_normal((2, 23, 144, c)), jnp.float32)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, c)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_pallas(x, w, rh=7)
    # real output cols are [0, 140); the kernel emits the aligned 136
    np.testing.assert_allclose(np.asarray(ref)[:, :, :136],
                               np.asarray(got), rtol=5e-4, atol=5e-4)


def test_convt_bwd_pallas_matches_vjp():
    """ops/pallas_convt_bwd.convt_k3s2_bwd: both u1 gradients vs jax.vjp
    of the reference convT core (interpret mode on CPU; the TPU A/B —
    9.72 → 7.10 ms at b32 — is in RESULTS.md round-4 cont.)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from nirgan_tpu.ops.conv import _convt_core_k3s2
    from nirgan_tpu.ops.pallas_convt_bwd import (
        convt_bwd_supported,
        convt_k3s2_bwd,
    )

    rng = np.random.default_rng(0)
    for b, hi, wi, ci, co in ((2, 12, 12, 128, 64), (1, 24, 16, 128, 64),
                              (2, 14, 10, 256, 128)):
        z = jnp.asarray(rng.random((b, hi, wi, ci)), jnp.float32)
        w = jnp.asarray(0.1 * rng.random((3, 3, ci, co)), jnp.float32)
        y, vjp = jax.vjp(_convt_core_k3s2, z, w)
        ct = jnp.asarray(rng.random(y.shape), jnp.float32)
        dz_ref, dw_ref = vjp(ct)
        assert convt_bwd_supported(ct.shape, w.shape)
        with pltpu.force_tpu_interpret_mode():
            dz, dw = convt_k3s2_bwd(ct, z, w)
        np.testing.assert_allclose(np.asarray(dz), np.asarray(dz_ref),
                                   rtol=0, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   rtol=0, atol=2e-3)


def test_convt_pallas_optin_grads_match(monkeypatch):
    """conv_transpose2d with the NIRGAN_PALLAS_CONVT path forced: same
    gradients as the default path (the opt-in must be a pure perf knob)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import nirgan_tpu.ops.conv as conv_mod

    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.random((2, 12, 12, 128)), jnp.float32)
    w = jnp.asarray(0.1 * rng.random((3, 3, 128, 64)), jnp.float32)
    bias = jnp.asarray(rng.random((64,)), jnp.float32)
    ct_seed = jnp.asarray(rng.random((2, 24, 24, 64)), jnp.float32)

    def loss(z, w, bias):
        return jnp.sum(conv_mod.conv_transpose2d(z, w, bias) * ct_seed)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(z, w, bias)
    monkeypatch.setattr(conv_mod, "_use_pallas_convt", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss, argnums=(0, 1, 2))(z, w, bias)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-3)


def test_conv3x3_reflect_pallas_v2_interpret():
    """v2 in-kernel-reflect trunk conv (ops/pallas_trunk.py): exact vs
    conv2d(reflect_pad2d(x, 1), w) in interpret mode, including all four
    mirrored edges.  (On real hardware the kernel is CLOSED: Mosaic
    rejects the ±1-column DMA windows — see the module docstring.)"""
    import numpy as np

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.ops.pad import reflect_pad2d
    from nirgan_tpu.ops.pallas_trunk import conv3x3_reflect_pallas

    rng = np.random.default_rng(7)
    B, H, W, WB, C = 2, 24, 21, 24, 8
    x = jnp.asarray(rng.standard_normal((B, H, WB, C)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, C, C)).astype(np.float32))
    ref = conv2d(reflect_pad2d(x[:, :, :W], 1), w)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_reflect_pallas(x, w, rh=8, wreal=W)
    np.testing.assert_allclose(np.asarray(got[:, :, :W]), np.asarray(ref),
                               rtol=0, atol=1e-4)
