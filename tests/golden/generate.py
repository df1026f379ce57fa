"""Generate golden parity fixtures from the torch reference checkout.

Run once where /root/reference exists:

    python tests/golden/generate.py

Produces small .npz fixtures (converted weights + input + expected output)
for the generator / inject-generator / discriminators and the RS-index loss
values, so the parity suite also runs on machines without the reference.
Tiny widths (ngf=ndf=8, 3 blocks) keep fixtures ~100 KB while exercising
every layer type.
"""

import os
import sys

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

from tests.conftest import load_reference_module  # noqa: E402
from nirgan_tpu.train.torch_convert import (  # noqa: E402
    convert_nlayer_discriminator,
    convert_pixel_discriminator,
    convert_resnet_generator,
)


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _flat(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flat(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def main():
    ref = load_reference_module("model/networks.py", "golden_ref_networks")
    assert ref is not None, "reference checkout required to generate fixtures"
    rng = np.random.default_rng(0)
    norm_layer = ref.get_norm_layer("instance")

    # --- generator (ngf=8, 3 blocks)
    torch.manual_seed(0)
    g = ref.ResnetGenerator(3, 1, 8, norm_layer=norm_layer, use_dropout=False,
                            n_blocks=3).eval()
    x = rng.standard_normal((2, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        y = g(torch.from_numpy(x)).numpy()
    np.savez_compressed(
        os.path.join(HERE, "resnet_generator.npz"),
        x=x, y=y, n_blocks=3, ngf=8,
        **{"p:" + k: v for k, v in _flat(convert_resnet_generator(_sd(g), n_blocks=3)).items()})

    # --- inject generator (via generator_inject, needs a module alias)
    import types

    pkg = types.ModuleType("model")
    pkg.networks = ref
    sys.modules["model"] = pkg
    sys.modules["model.networks"] = ref
    gi = load_reference_module("model/generator_inject.py", "golden_ref_inject")

    class _C:  # config shim
        pass

    cfg = _C(); cfg.base_configs = _C(); cfg.satclip = _C()
    cfg.base_configs.input_nc, cfg.base_configs.output_nc = 3, 1
    cfg.base_configs.ngf, cfg.base_configs.no_dropout = 8, True
    cfg.satclip.satclip_inject_style = "multiply"
    cfg.satclip.post_correction = True
    # non-identity init so the fixture actually exercises the output
    # scalar (init 1.0 made a missing multiply invisible — the round-4
    # inject-parity lesson)
    cfg.satclip.post_correction_init = 0.8
    cfg.satclip.scaling_param = True
    cfg.satclip.scaling_param_init = 0.01
    torch.manual_seed(1)
    ginj = gi.ResnetGenerator_inject(cfg, norm_layer=norm_layer, n_blocks=3).eval()
    # the 256→128² fc is 4.2 M params — refill it from a stored numpy seed so
    # the fixture stays small; the test reconstructs it from the same seed.
    fc_rng = np.random.default_rng(42)
    fc_w = (fc_rng.standard_normal((128 * 128, 256)) * 0.02).astype(np.float32)
    fc_b = np.zeros(128 * 128, np.float32)
    with torch.no_grad():
        ginj.fc.weight.copy_(torch.from_numpy(fc_w))
        ginj.fc.bias.copy_(torch.from_numpy(fc_b))
    e = rng.standard_normal((2, 256)).astype(np.float32)
    xi = rng.standard_normal((2, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        yi = ginj(torch.from_numpy(xi), torch.from_numpy(e)).numpy()
    inj_params = convert_resnet_generator(_sd(ginj), n_blocks=3)
    del inj_params["fc"]  # reconstructed from fc_seed in the test
    np.savez_compressed(
        os.path.join(HERE, "resnet_inject.npz"),
        x=xi, e=e, y=yi, n_blocks=3, ngf=8, fc_seed=42,
        **{"p:" + k: v for k, v in _flat(inj_params).items()})

    # --- discriminators
    torch.manual_seed(2)
    d = ref.NLayerDiscriminator(4, 8, n_layers=3, norm_layer=norm_layer).eval()
    xd = rng.standard_normal((2, 4, 64, 64)).astype(np.float32)
    with torch.no_grad():
        yd = d(torch.from_numpy(xd)).numpy()
    np.savez_compressed(
        os.path.join(HERE, "nlayer_discriminator.npz"), x=xd, y=yd, ndf=8,
        **{"p:" + k: v for k, v in _flat(convert_nlayer_discriminator(_sd(d))).items()})

    torch.manual_seed(3)
    px = ref.PixelDiscriminator(4, 8, norm_layer=norm_layer).eval()
    with torch.no_grad():
        yp = px(torch.from_numpy(xd)).numpy()
    np.savez_compressed(
        os.path.join(HERE, "pixel_discriminator.npz"), x=xd, y=yp, ndf=8,
        **{"p:" + k: v for k, v in _flat(convert_pixel_discriminator(_sd(px))).items()})

    # --- RS index loss golden values
    rs = load_reference_module("utils/remote_sensing_indices.py", "golden_ref_rs")
    rgb = (rng.random((2, 3, 24, 24)) * 0.9 + 0.01).astype(np.float32)
    nir = (rng.random((2, 1, 24, 24)) * 0.9 + 0.01).astype(np.float32)
    nirp = (rng.random((2, 1, 24, 24)) * 0.9 + 0.01).astype(np.float32)
    vals = {}
    for crit in ("l1", "l2"):
        obj = rs.RemoteSensingIndices(mode="loss", criterion=crit)
        for name in ("ndvi", "ndwi", "gndvi", "savi", "msavi", "evi"):
            t = getattr(obj, f"{name}_calculation")(
                torch.from_numpy(rgb), torch.from_numpy(nir), torch.from_numpy(nirp))
            vals[f"{crit}:{name}"] = np.float64(t.item())
    np.savez_compressed(os.path.join(HERE, "rs_losses.npz"),
                        rgb=rgb, nir=nir, nirp=nirp, **vals)

    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()


def unet_fixture():
    """Extra fixture: unet_256 generator (ngf=8)."""
    ref = load_reference_module("model/networks.py", "golden_ref_networks_u")
    from nirgan_tpu.train.torch_convert import convert_unet_generator

    rng = np.random.default_rng(7)
    norm_layer = ref.get_norm_layer("instance")
    torch.manual_seed(7)
    net = ref.UnetGenerator(3, 1, 7, 4, norm_layer=norm_layer,
                            use_dropout=False).eval()
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        y = net(torch.from_numpy(x)).numpy()
    np.savez_compressed(
        os.path.join(HERE, "unet_generator.npz"), x=x, y=y, ngf=4, num_downs=7,
        **{"p:" + k: v for k, v in _flat(convert_unet_generator(_sd(net), num_downs=7)).items()})
    print("unet fixture written")


if __name__ == "__main__" and "--unet-only" in sys.argv:
    unet_fixture()
