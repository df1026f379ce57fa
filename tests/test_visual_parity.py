"""Trained-weights visual parity proxy (VERDICT round-1 missing item 4).

The published HF checkpoints cannot be fetched in this zero-egress
container, so the closest achievable check: briefly *train* the torch
reference generator (so its weights are structured, not random-init),
convert the checkpoint, and drive both stacks over the same imagery-like
tiles.  The bar mirrors BASELINE.md (PSNR within 0.1 dB on real weights):
here we assert the two stacks' predictions agree to >= 50 dB PSNR — far
inside the 0.1 dB budget — and record the measured delta in
benchmarks/parity_report.json for the perf log.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax

from tests.conftest import REPO_ROOT, load_reference_module


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
    out = os.path.join(REPO_ROOT, "benchmarks", "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    assert psnr_agree >= 50.0, report
