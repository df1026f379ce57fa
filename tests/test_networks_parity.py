"""Network-level golden parity: the torch reference implementation (imported
read-only from /root/reference, never vendored) is run on random inputs and
its weights converted into the JAX networks; outputs must agree to float32
conv tolerance.  Skipped automatically when the reference checkout is absent.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_module
from nirgan_tpu.models import define_G, define_D
from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.train.torch_convert import (
    convert_resnet_generator,
    convert_nlayer_discriminator,
    convert_pixel_discriminator,
)

ref_networks = load_reference_module("model/networks.py", "ref_networks")
pytestmark = pytest.mark.skipif(ref_networks is None, reason="reference checkout not present")


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("n_blocks,netG", [(9, "resnet_9blocks"), (6, "resnet_6blocks")])
def test_resnet_generator_parity(n_blocks, netG):
    torch.manual_seed(0)
    norm_layer = ref_networks.get_norm_layer("instance")
    tnet = ref_networks.ResnetGenerator(3, 1, 64, norm_layer=norm_layer,
                                        use_dropout=False, n_blocks=n_blocks).eval()

    x = np.random.default_rng(0).standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(_nchw(x))).numpy()

    jnet = define_G(3, 1, 64, netG, norm="instance")
    params = convert_resnet_generator(_sd(tnet), n_blocks=n_blocks)
    out = jnet.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_resnet_inject_generator_parity():
    """Inject variant: same trunk + fc/scale/post-correction path
    (reference model/generator_inject.py:105-135)."""
    gi = load_reference_module("model/networks.py", "model.networks")
    # generator_inject does `from model.networks import ResnetBlock`
    import types

    pkg = types.ModuleType("model")
    pkg.networks = gi
    sys.modules.setdefault("model", pkg)
    ref_inject = load_reference_module("model/generator_inject.py", "ref_generator_inject")

    class _Cfg:  # minimal config shim for the reference constructor
        pass

    cfg = _Cfg()
    cfg.base_configs = _Cfg()
    cfg.base_configs.input_nc, cfg.base_configs.output_nc = 3, 1
    cfg.base_configs.ngf = 64
    cfg.base_configs.no_dropout = True
    cfg.satclip = _Cfg()
    cfg.satclip.satclip_inject_style = "multiply"
    cfg.satclip.post_correction = True
    # non-identity: a missing post-correction multiply must fail the test
    cfg.satclip.post_correction_init = 0.8
    cfg.satclip.scaling_param = True
    cfg.satclip.scaling_param_init = 0.01

    torch.manual_seed(1)
    norm_layer = gi.get_norm_layer("instance")
    tnet = ref_inject.ResnetGenerator_inject(cfg, norm_layer=norm_layer, n_blocks=9).eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    e = rng.standard_normal((2, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(_nchw(x)), torch.from_numpy(e)).numpy()

    jnet = ResnetGenerator(3, 1, 64, norm_type="instance", n_blocks=9, inject=True,
                           inject_style="multiply", scaling_param=True,
                           scaling_param_init=0.01, post_correction=True,
                           post_correction_init=0.8)
    params = convert_resnet_generator(_sd(tnet), n_blocks=9)
    out = jnet.apply({"params": params}, jnp.asarray(x), jnp.asarray(e))
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_nlayer_discriminator_parity():
    torch.manual_seed(2)
    norm_layer = ref_networks.get_norm_layer("instance")
    tnet = ref_networks.NLayerDiscriminator(4, 64, n_layers=3, norm_layer=norm_layer).eval()

    x = np.random.default_rng(2).standard_normal((2, 70, 70, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(_nchw(x))).numpy()

    jnet = define_D(4, 64, "basic", norm="instance")
    params = convert_nlayer_discriminator(_sd(tnet))
    out = jnet.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_pixel_discriminator_parity():
    torch.manual_seed(3)
    norm_layer = ref_networks.get_norm_layer("instance")
    tnet = ref_networks.PixelDiscriminator(4, 64, norm_layer=norm_layer).eval()

    x = np.random.default_rng(3).standard_normal((2, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(_nchw(x))).numpy()

    jnet = define_D(4, 64, "pixel", norm="instance")
    params = convert_pixel_discriminator(_sd(tnet))
    out = jnet.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_generator_param_count_matches_reference_scale():
    """README.md:69 quotes ≈11 M params for the resnet_9blocks generator."""
    jnet = define_G(3, 1, 64, "resnet_9blocks", norm="instance")
    params = jnet.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 11_000_000 < n < 11_500_000, n


def test_init_statistics():
    """init_weights N(0, 0.02) semantics (model/networks.py:79-96)."""
    jnet = define_G(3, 1, 64, "resnet_9blocks", norm="instance", init_type="normal",
                    init_gain=0.02)
    params = jnet.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    k = np.asarray(params["r0"]["conv1"]["kernel"])
    assert abs(k.std() - 0.02) < 0.002
    assert abs(k.mean()) < 0.002
    assert np.all(np.asarray(params["r0"]["conv1"]["bias"]) == 0)


@pytest.mark.parametrize("num_downs,netG,size", [(7, "unet_128", 128),
                                                 (8, "unet_256", 256)])
def test_unet_generator_parity(num_downs, netG, size):
    from nirgan_tpu.train.torch_convert import convert_unet_generator

    torch.manual_seed(4)
    norm_layer = ref_networks.get_norm_layer("instance")
    tnet = ref_networks.UnetGenerator(3, 1, num_downs, 8, norm_layer=norm_layer,
                                      use_dropout=False).eval()
    x = np.random.default_rng(4).standard_normal((1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(_nchw(x))).numpy()

    jnet = define_G(3, 1, 8, netG, norm="instance")
    params = convert_unet_generator(_sd(tnet), num_downs=num_downs)
    out = jnet.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_nhwc(ref), np.asarray(out), rtol=1e-4, atol=2e-4)
