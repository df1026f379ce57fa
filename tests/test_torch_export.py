"""JAX → torch reverse export (``train/torch_convert.py`` ``export_*``).

Interop has to work both ways for a reference user to switch safely: the
emitted state_dict must load into the *reference* nets with ``strict=True``
(proving key-set completeness), forward outputs must match cross-stack, and
converting the export back must reproduce the flax tree bit-exactly.
Reference layouts: ``model/networks.py:341-370`` (generator Sequential),
``:557-580`` (NLayer D), ``:604-612`` (Pixel D),
``model/generator_inject.py:88-100`` (inject extras).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nirgan_tpu.models.discriminator import NLayerDiscriminator, PixelDiscriminator
from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.train.torch_convert import (
    convert_nlayer_discriminator,
    convert_resnet_generator,
    export_nlayer_discriminator,
    export_pixel_discriminator,
    export_resnet_generator,
)
from tests.conftest import load_reference_module


def _to_torch(sd_np):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd_np.items()}


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    for k, v in la:
        np.testing.assert_array_equal(np.asarray(v, np.float32),
                                      np.asarray(lb[jax.tree_util.keystr(k)],
                                                 np.float32))
    assert len(la) == len(lb)


def test_export_plain_generator_strict_and_forward():
    networks = load_reference_module("model/networks.py", "ref_networks_exp")
    if networks is None:
        pytest.skip("reference checkout not present")
    g = ResnetGenerator(input_nc=3, output_nc=1, ngf=16, n_blocks=9,
                        compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 48, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), x)["params"]

    sd = export_resnet_generator(jax.device_get(params), n_blocks=9)
    net = networks.ResnetGenerator(
        3, 1, 16, norm_layer=networks.get_norm_layer("instance"),
        use_dropout=False, n_blocks=9)
    missing, unexpected = net.load_state_dict(_to_torch(sd), strict=True)
    assert not missing and not unexpected

    net.eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(
            np.asarray(x).transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(g.apply({"params": params}, x, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # export → convert is the identity on the param tree (bit-exact f32)
    back = convert_resnet_generator(sd, n_blocks=9)
    _tree_equal(params, back)


def test_export_inject_generator_strict():
    from tests.test_visual_parity import _load_ref_inject, _ref_inject_cfg

    networks, ref_inject = _load_ref_inject()
    if ref_inject is None:
        pytest.skip("reference checkout not present")
    g = ResnetGenerator(input_nc=3, output_nc=1, ngf=16, n_blocks=9,
                        inject=True, post_correction=True,
                        compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 48, 3), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(2), (1, 256), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), x, e)["params"]

    sd = export_resnet_generator(jax.device_get(params), n_blocks=9)
    cfg = _ref_inject_cfg()
    cfg.base_configs.ngf = 16
    net = ref_inject.ResnetGenerator_inject(
        cfg, norm_layer=networks.get_norm_layer("instance"), n_blocks=9)
    missing, unexpected = net.load_state_dict(_to_torch(sd), strict=True)
    assert not missing and not unexpected

    net.eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)),
                  torch.from_numpy(np.asarray(e))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(g.apply({"params": params}, x, e, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_export_unet_generator_strict_and_forward():
    networks = load_reference_module("model/networks.py", "ref_networks_exp3")
    if networks is None:
        pytest.skip("reference checkout not present")
    from nirgan_tpu.models.unet import UnetGenerator
    from nirgan_tpu.train.torch_convert import (
        convert_unet_generator,
        export_unet_generator,
    )

    g = UnetGenerator(input_nc=3, output_nc=1, num_downs=7, ngf=8,
                      compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), x)["params"]

    sd = export_unet_generator(jax.device_get(params), num_downs=7)
    net = networks.UnetGenerator(
        3, 1, 7, ngf=8, norm_layer=networks.get_norm_layer("instance"),
        use_dropout=False)
    missing, unexpected = net.load_state_dict(_to_torch(sd), strict=True)
    assert not missing and not unexpected

    net.eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(
            np.asarray(x).transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(g.apply({"params": params}, x, train=False))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    _tree_equal(params, convert_unet_generator(sd, num_downs=7))


def test_export_discriminators_strict():
    networks = load_reference_module("model/networks.py", "ref_networks_exp2")
    if networks is None:
        pytest.skip("reference checkout not present")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 4), jnp.float32)

    d = NLayerDiscriminator(input_nc=4, ndf=16, n_layers=3)
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    sd = export_nlayer_discriminator(jax.device_get(params), n_layers=3)
    net = networks.NLayerDiscriminator(
        4, 16, n_layers=3, norm_layer=networks.get_norm_layer("instance"))
    missing, unexpected = net.load_state_dict(_to_torch(sd), strict=True)
    assert not missing and not unexpected
    net.eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(
            np.asarray(x).transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(d.apply({"params": params}, x, train=False))
    np.testing.assert_allclose(got, ref, atol=3e-5)
    _tree_equal(params, convert_nlayer_discriminator(sd, n_layers=3))

    dp = PixelDiscriminator(input_nc=4, ndf=16)
    params_p = dp.init(jax.random.PRNGKey(0), x)["params"]
    sd_p = export_pixel_discriminator(jax.device_get(params_p))
    net_p = networks.PixelDiscriminator(
        4, 16, norm_layer=networks.get_norm_layer("instance"))
    missing, unexpected = net_p.load_state_dict(_to_torch(sd_p), strict=True)
    assert not missing and not unexpected


def test_task_export_file_roundtrip(tmp_path):
    """task.export_torch_weights writes a .ckpt our own loader (and so the
    reference's torch.load path) round-trips to the same trees."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=64)
    path = task.export_torch_weights(str(tmp_path / "exported.ckpt"), state)

    loaded = task.load_torch_weights(path)
    _tree_equal(jax.device_get(state.params_g), loaded["params_g"])
    _tree_equal(jax.device_get(state.params_d), loaded["params_d"])
