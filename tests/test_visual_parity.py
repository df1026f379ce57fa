"""Trained-weights visual parity proxy (VERDICT round-1 missing item 4).

The published HF checkpoints cannot be fetched in this zero-egress
container, so the closest achievable check: briefly *train* the torch
reference generator (so its weights are structured, not random-init),
convert the checkpoint, and drive both stacks over the same imagery-like
tiles.  The bar mirrors BASELINE.md (PSNR within 0.1 dB on real weights):
every route measures ~126 dB agreement (after the round-4 post_correction
test-setup fix, benchmarks/debug_inject_bisect.py) and the per-route bars
are pinned at measured − 12 dB so a silent regression to "merely very
good" fails loudly.  Measured deltas land in benchmarks/parity_report.json.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax

from tests.conftest import REPO_ROOT, load_reference_module


def _update_report(key, entry):
    """parity_report.json is a dict of per-variant entries; tests
    read-modify-write their own key."""
    out = os.path.join(REPO_ROOT, "benchmarks", "parity_report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
        if "setting" in report:  # migrate the old single-entry layout
            report = {"plain_96": report}
    report[key] = entry
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


def _imagery_like_tiles(n, size, seed=0):
    """Smooth correlated fields in [0,1] — reflectance-like, not iid noise."""
    rng = np.random.default_rng(seed)
    base = rng.random((n, 3, size // 8, size // 8)).astype(np.float32)
    t = torch.nn.functional.interpolate(torch.from_numpy(base), size=(size, size),
                                        mode="bicubic", align_corners=False)
    t = t + 0.05 * torch.from_numpy(
        rng.standard_normal((n, 3, size, size)).astype(np.float32))
    return t.clamp(0, 1)


@pytest.mark.slow
def test_trained_torch_weights_visual_parity(tmp_path):
    networks = load_reference_module("model/networks.py", "ref_networks_vp")
    if networks is None:
        pytest.skip("reference checkout not present")

    torch.manual_seed(0)
    norm = networks.get_norm_layer("instance")
    net = networks.ResnetGenerator(3, 1, 64, norm_layer=norm, use_dropout=False,
                                   n_blocks=9)

    # brief real training so the weights are structured, not N(0, 0.02):
    # regress NIR = band-ratio-ish target from smooth tiles
    opt = torch.optim.Adam(net.parameters(), lr=2e-4, betas=(0.5, 0.999))
    size = 96
    x = _imagery_like_tiles(4, size, seed=1)
    target = (0.7 * x[:, 1:2] + 0.3 * x[:, 0:1]).clamp(0, 1) * 2 - 1
    net.train()
    for it in range(25):
        opt.zero_grad()
        loss = torch.nn.functional.l1_loss(net(x), target)
        loss.backward()
        opt.step()
    final_l1 = float(loss)
    assert final_l1 < 0.5  # it actually trained

    sd = {f"netG.{k}": v for k, v in net.state_dict().items()}
    ckpt_path = str(tmp_path / "trainedish.ckpt")
    torch.save({"state_dict": sd}, ckpt_path)

    # evaluation tiles the model never saw
    net.eval()
    xe = _imagery_like_tiles(2, size, seed=2)
    with torch.no_grad():
        ref_pred = net(torch.nn.functional.pad(xe, (10, 10, 10, 10),
                                               mode="reflect"))
        ref_pred = ref_pred[:, :, 10:-10, 10:-10].numpy()

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config(os.path.join(REPO_ROOT, "configs/config_px2px.yaml"))
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [size]
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=size)
    loaded = task.load_torch_weights(ckpt_path)
    from nirgan_tpu.train.checkpoint import merge_params

    task.bind(merge_params(jax.device_get(state.params_g), loaded["params_g"]))
    got = task.predict_step(xe.numpy())

    err = np.mean((got - ref_pred) ** 2)
    psnr_agree = 10 * np.log10(4.0 / max(err, 1e-12))  # range [-1,1] → max²=4
    # per-stack image quality vs the torch output — the BASELINE.md framing
    report = {
        "setting": "torch reference generator, 25 L1 steps @96² (trained-ish), "
                   "reflect-pad-10 inference, f32 both stacks",
        "cross_stack_psnr_dB": round(float(psnr_agree), 2),
        "max_abs_delta": round(float(np.max(np.abs(got - ref_pred))), 6),
        "torch_final_train_l1": round(final_l1, 4),
    }
    _update_report("plain_96", report)
    # measured 126.02 dB (parity_report.json); bar = measured − 12
    assert psnr_agree >= 114.0, report


def _psnr_range2(a, b):
    err = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * np.log10(4.0 / max(err, 1e-12))


def _ref_inject_cfg():
    class _Cfg:
        pass

    cfg = _Cfg()
    cfg.base_configs = _Cfg()
    cfg.base_configs.input_nc, cfg.base_configs.output_nc = 3, 1
    cfg.base_configs.ngf = 64
    cfg.base_configs.no_dropout = True
    cfg.satclip = _Cfg()
    cfg.satclip.satclip_inject_style = "multiply"
    cfg.satclip.post_correction = True
    cfg.satclip.post_correction_init = 1.0
    cfg.satclip.scaling_param = True
    cfg.satclip.scaling_param_init = 0.01
    return cfg


def _load_ref_inject():
    import sys
    import types

    networks = load_reference_module("model/networks.py", "model.networks")
    if networks is None:
        return None, None
    pkg = types.ModuleType("model")
    pkg.networks = networks
    sys.modules.setdefault("model", pkg)
    sys.modules["model.networks"] = networks
    return networks, load_reference_module("model/generator_inject.py",
                                           "ref_generator_inject_vp")


@pytest.mark.slow
def test_trained_inject_visual_parity_512(tmp_path):
    """SatCLIP-inject generator, trained-weights, full-size treatment
    (VERDICT round-2 item 4): brief torch training at 96², convert, compare
    both stacks at 512² + reflect-pad-10 through the full task predict
    route (reference ``model/generator_inject.py:105-135``)."""
    networks, ref_inject = _load_ref_inject()
    if ref_inject is None:
        pytest.skip("reference checkout not present")

    torch.manual_seed(0)
    norm = networks.get_norm_layer("instance")
    tnet = ref_inject.ResnetGenerator_inject(
        _ref_inject_cfg(), norm_layer=norm, n_blocks=9)

    rng = np.random.default_rng(0)
    embeds_tr = torch.from_numpy(
        rng.standard_normal((4, 256)).astype(np.float32))
    x = _imagery_like_tiles(4, 96, seed=1)
    target = (0.7 * x[:, 1:2] + 0.3 * x[:, 0:1]).clamp(0, 1) * 2 - 1
    opt = torch.optim.Adam(tnet.parameters(), lr=2e-4, betas=(0.5, 0.999))
    tnet.train()
    for _ in range(25):
        opt.zero_grad()
        loss = torch.nn.functional.l1_loss(tnet(x, embeds_tr), target)
        loss.backward()
        opt.step()

    size = 512
    xe = _imagery_like_tiles(1, size, seed=2)
    embeds = rng.standard_normal((1, 256)).astype(np.float32)
    tnet.eval()
    with torch.no_grad():
        xp = torch.nn.functional.pad(xe, (10,) * 4, mode="reflect")
        ref_pred = tnet(xp, torch.from_numpy(embeds))[
            :, :, 10:-10, 10:-10].numpy()

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    cfg = load_config(os.path.join(REPO_ROOT,
                                   "configs/config_px2px_SatCLIP.yaml"))
    # the torch side (_ref_inject_cfg) trains WITH post_correction; the
    # shipped YAML has it off — round-3's 64 dB inject "delta" was exactly
    # this un-applied 0.9965 trained scalar (benchmarks/debug_inject_bisect.py)
    cfg.satclip.post_correction = True
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [size]
    task = Px2PxTask(cfg)
    assert task.satclip_style == "inject"
    # fixed embeds stand in for the (absent) SatCLIP ckpt in BOTH stacks
    task.satclip_model.predict = lambda coords: embeds
    sd = {f"netG.{k}": v.detach().numpy().copy()
          for k, v in tnet.state_dict().items()}
    state = task.init_state(seed=0, image_size=96)
    loaded = task.load_torch_weights(sd)
    task.bind(merge_params(jax.device_get(state.params_g),
                           loaded["params_g"]))
    got = task.predict_step(xe.numpy(), coords=np.zeros((1, 2), np.float32))

    psnr = _psnr_range2(got, ref_pred)
    report = {
        "setting": "inject generator (ngf64/9blk), 25 L1 steps @96², "
                   "512²+reflect-pad-10 predict route, f32",
        "cross_stack_psnr_dB": round(float(psnr), 2),
        "max_abs_delta": round(float(np.max(np.abs(got - ref_pred))), 6),
    }
    _update_report("inject_512", report)
    # measured 126.02 dB after the round-4 post_correction test fix
    # (benchmarks/debug_inject_bisect.py); bar = measured − 12
    assert psnr >= 114.0, report


@pytest.mark.slow
def test_trained_concat_visual_parity_512(tmp_path):
    """Concat route, trained-weights, 512²: the embedding plane
    (view→expand→bicubic with the reference's swapped-size call→scale,
    ``model/pix2pix.py:466-476``) + 4-channel generator in both stacks."""
    networks = load_reference_module("model/networks.py", "ref_networks_cc")
    if networks is None:
        pytest.skip("reference checkout not present")

    torch.manual_seed(0)
    norm = networks.get_norm_layer("instance")
    tnet = networks.ResnetGenerator(4, 1, 64, norm_layer=norm,
                                    use_dropout=False, n_blocks=9)

    rng = np.random.default_rng(3)
    scaling_factor = 0.3

    def torch_concat(rgb_t, embeds_np):
        # transcription of satclip_get_concat (pix2pix.py:466-476)
        e = torch.from_numpy(embeds_np)
        e = e.view(rgb_t.shape[0], 1, 1, 256)
        e = e.expand(rgb_t.shape[0], 1, 256, 256)
        e = torch.nn.functional.interpolate(
            e, size=(rgb_t.shape[-1], rgb_t.shape[-2]), mode="bicubic")
        return torch.cat((rgb_t, e * scaling_factor), dim=1)

    x = _imagery_like_tiles(4, 96, seed=1)
    embeds_tr = rng.standard_normal((4, 256)).astype(np.float32)
    x4 = torch_concat(x, embeds_tr)
    target = (0.7 * x[:, 1:2] + 0.3 * x[:, 0:1]).clamp(0, 1) * 2 - 1
    opt = torch.optim.Adam(tnet.parameters(), lr=2e-4, betas=(0.5, 0.999))
    tnet.train()
    for _ in range(25):
        opt.zero_grad()
        loss = torch.nn.functional.l1_loss(tnet(x4), target)
        loss.backward()
        opt.step()

    size = 512
    xe = _imagery_like_tiles(1, size, seed=2)
    embeds = rng.standard_normal((1, 256)).astype(np.float32)
    tnet.eval()
    with torch.no_grad():
        x4e = torch_concat(xe, embeds)
        xp = torch.nn.functional.pad(x4e, (10,) * 4, mode="reflect")
        ref_pred = tnet(xp)[:, :, 10:-10, 10:-10].numpy()

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    cfg = load_config(os.path.join(REPO_ROOT,
                                   "configs/config_px2px_SatCLIP.yaml"))
    cfg.satclip.satclip_style = "concat"
    cfg.satclip.scaling_factor = scaling_factor
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [size]
    task = Px2PxTask(cfg)
    task.satclip_model.predict = lambda coords: embeds
    sd = {f"netG.{k}": v.detach().numpy().copy()
          for k, v in tnet.state_dict().items()}
    state = task.init_state(seed=0, image_size=96)
    loaded = task.load_torch_weights(sd)
    task.bind(merge_params(jax.device_get(state.params_g),
                           loaded["params_g"]))
    got = task.predict_step(xe.numpy(), coords=np.zeros((1, 2), np.float32))

    psnr = _psnr_range2(got, ref_pred)
    report = {
        "setting": "concat route (4-ch ngf64/9blk + embedding plane), "
                   "25 L1 steps @96², 512²+reflect-pad-10, f32",
        "cross_stack_psnr_dB": round(float(psnr), 2),
        "max_abs_delta": round(float(np.max(np.abs(got - ref_pred))), 6),
    }
    _update_report("concat_512", report)
    # measured 126.02 dB; bar = measured − 12
    assert psnr >= 114.0, report


@pytest.mark.slow
def test_trained_discriminator_parity_512(tmp_path):
    """NLayer PatchGAN discriminator, trained-weights, 512² logits
    (reference ``model/networks.py:539-584``): a few real lsgan D steps,
    convert, compare the 512² logit maps."""
    networks = load_reference_module("model/networks.py", "ref_networks_dp")
    if networks is None:
        pytest.skip("reference checkout not present")

    torch.manual_seed(0)
    norm = networks.get_norm_layer("instance")
    netD = networks.NLayerDiscriminator(4, 64, n_layers=3, norm_layer=norm)
    crit = networks.GANLoss("lsgan")
    opt = torch.optim.Adam(netD.parameters(), lr=2e-4, betas=(0.5, 0.999))

    x = _imagery_like_tiles(4, 96, seed=1)
    nir_real = (0.7 * x[:, 1:2] + 0.3 * x[:, 0:1]).clamp(0, 1)
    nir_fake = (nir_real + 0.1 * torch.randn_like(nir_real)).clamp(0, 1)
    netD.train()
    for _ in range(25):
        opt.zero_grad()
        loss = (crit(netD(torch.cat((x, nir_fake), 1)), False)
                + crit(netD(torch.cat((x, nir_real), 1)), True))
        loss.backward()
        opt.step()

    size = 512
    xe = _imagery_like_tiles(1, size, seed=2)
    ne = (0.6 * xe[:, 1:2] + 0.4 * xe[:, 2:3]).clamp(0, 1)
    netD.eval()
    with torch.no_grad():
        ref_logits = netD(torch.cat((xe, ne), 1)).numpy()

    import jax.numpy as jnp

    from nirgan_tpu.models import define_D
    from nirgan_tpu.train.torch_convert import convert_nlayer_discriminator

    sd = {f"netD.{k}": v.detach().numpy().copy()
          for k, v in netD.state_dict().items()}
    jnet = define_D(4, 64, "basic", norm="instance")
    params = convert_nlayer_discriminator(sd, prefix="netD.")
    x_nhwc = np.transpose(np.concatenate(
        [xe.numpy(), ne.numpy()], axis=1), (0, 2, 3, 1))
    got = np.transpose(np.asarray(
        jnet.apply({"params": params}, jnp.asarray(x_nhwc))), (0, 3, 1, 2))

    # logits are unbounded; report agreement vs the logit dynamic range
    rng_ref = float(ref_logits.max() - ref_logits.min())
    err = float(np.mean((got - ref_logits) ** 2))
    psnr = 10 * np.log10(max(rng_ref, 1e-6) ** 2 / max(err, 1e-12))
    report = {
        "setting": "NLayer PatchGAN (ndf64/3), 25 lsgan D steps @96², "
                   "512² logit maps, f32",
        "cross_stack_psnr_dB": round(float(psnr), 2),
        "max_abs_delta": round(float(np.max(np.abs(got - ref_logits))), 6),
        "logit_range": round(rng_ref, 4),
    }
    _update_report("discriminator_512", report)
    # measured 127.23 dB; bar = measured − 12
    assert psnr >= 115.0, report
