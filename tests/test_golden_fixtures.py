"""Standalone golden-parity tests against committed fixtures (generated from
the torch reference by tests/golden/generate.py).  These run on any machine
— no reference checkout, no torch forward — pinning the converted-weight
numerics of every network family and the RS losses."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from nirgan_tpu.models import define_D, define_G
from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.losses.rs_indices import RemoteSensingIndices

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing")
    return np.load(path)


def _params(z):
    tree: dict = {}
    for k in z.files:
        if not k.startswith("p:"):
            continue
        parts = k[2:].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[k]
    return tree


def _nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def test_golden_resnet_generator():
    z = _load("resnet_generator.npz")
    net = ResnetGenerator(3, 1, int(z["ngf"]), norm_type="instance",
                          n_blocks=int(z["n_blocks"]))
    out = net.apply({"params": _params(z)}, jnp.asarray(_nhwc(z["x"])))
    np.testing.assert_allclose(_nhwc(z["y"]), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_golden_resnet_inject():
    z = _load("resnet_inject.npz")
    params = _params(z)
    fc_rng = np.random.default_rng(int(z["fc_seed"]))
    fc_w = (fc_rng.standard_normal((128 * 128, 256)) * 0.02).astype(np.float32)
    params["fc"] = {"kernel": fc_w.T, "bias": np.zeros(128 * 128, np.float32)}
    net = ResnetGenerator(3, 1, int(z["ngf"]), norm_type="instance",
                          n_blocks=int(z["n_blocks"]), inject=True,
                          inject_style="multiply", scaling_param=True,
                          post_correction=True)
    out = net.apply({"params": params}, jnp.asarray(_nhwc(z["x"])),
                    jnp.asarray(z["e"]))
    np.testing.assert_allclose(_nhwc(z["y"]), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_golden_nlayer_discriminator():
    z = _load("nlayer_discriminator.npz")
    net = define_D(4, int(z["ndf"]), "basic", norm="instance")
    out = net.apply({"params": _params(z)}, jnp.asarray(_nhwc(z["x"])))
    np.testing.assert_allclose(_nhwc(z["y"]), np.asarray(out), rtol=1e-4, atol=2e-4)


def test_golden_pixel_discriminator():
    z = _load("pixel_discriminator.npz")
    net = define_D(4, int(z["ndf"]), "pixel", norm="instance")
    out = net.apply({"params": _params(z)}, jnp.asarray(_nhwc(z["x"])))
    np.testing.assert_allclose(_nhwc(z["y"]), np.asarray(out), rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("criterion", ["l1", "l2"])
def test_golden_rs_losses(criterion):
    z = _load("rs_losses.npz")
    rgb, nir, nirp = (jnp.asarray(_nhwc(z[k])) for k in ("rgb", "nir", "nirp"))
    obj = RemoteSensingIndices(mode="loss", criterion=criterion)
    for name in ("ndvi", "ndwi", "gndvi", "savi", "msavi", "evi"):
        ref = float(z[f"{criterion}:{name}"])
        out = float(getattr(obj, f"{name}_calculation")(rgb, nir, nirp))
        assert abs(ref - out) < 2e-5 * max(1.0, abs(ref)), (name, ref, out)


def test_golden_unet_generator():
    z = _load("unet_generator.npz")
    net = define_G(3, 1, int(z["ngf"]),
                   "unet_128" if int(z["num_downs"]) == 7 else "unet_256",
                   norm="instance")
    out = net.apply({"params": _params(z)}, jnp.asarray(_nhwc(z["x"])))
    np.testing.assert_allclose(_nhwc(z["y"]), np.asarray(out), rtol=1e-4, atol=2e-4)
