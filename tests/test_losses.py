"""Loss/metric parity tests.

RS-index losses run golden against the imported reference implementation
(torch-only module).  The EMD loss is checked against an independent torch
transcription of its documented formula.  SSIM is validated against an
independent scipy implementation of the Gaussian-window SSIM algorithm plus
analytic properties (the reference's kornia dependency is unavailable here).
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tests.conftest import load_reference_module
from nirgan_tpu.losses import (
    RemoteSensingIndices,
    calculate_metrics,
    emd_loss,
    gan_loss,
    psnr,
    ssim,
    ssim_loss,
)

ref_rs = load_reference_module("utils/remote_sensing_indices.py", "ref_rs_indices")


def _rand(shape, seed, lo=0.01, hi=0.9):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) * (hi - lo) + lo).astype(np.float32)


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------- GAN loss

def test_lsgan_loss_matches_torch():
    d = np.random.default_rng(0).standard_normal((2, 30, 30, 1)).astype(np.float32)
    td = torch.from_numpy(d)
    for real in (True, False):
        ref = F.mse_loss(td, torch.full_like(td, 1.0 if real else 0.0)).item()
        out = float(gan_loss(jnp.asarray(d), real, "lsgan"))
        assert abs(ref - out) < 1e-6


def test_vanilla_gan_loss_matches_torch():
    d = np.random.default_rng(1).standard_normal((2, 30, 30, 1)).astype(np.float32)
    td = torch.from_numpy(d)
    for real in (True, False):
        ref = F.binary_cross_entropy_with_logits(
            td, torch.full_like(td, 1.0 if real else 0.0)).item()
        out = float(gan_loss(jnp.asarray(d), real, "vanilla"))
        assert abs(ref - out) < 1e-6


def test_wgangp_loss():
    d = np.random.default_rng(2).standard_normal((2, 8, 8, 1)).astype(np.float32)
    assert abs(float(gan_loss(jnp.asarray(d), True, "wgangp")) + d.mean()) < 1e-6
    assert abs(float(gan_loss(jnp.asarray(d), False, "wgangp")) - d.mean()) < 1e-6


# ---------------------------------------------------------------- EMD loss

def test_emd_loss_matches_reference_formula():
    # independent torch transcription of utils/losses.py:64-78
    p = _rand((3, 16, 16, 1), 3)
    t = _rand((3, 16, 16, 1), 4)
    tp = torch.from_numpy(_nchw(p)).reshape(3, -1)
    tt = torch.from_numpy(_nchw(t)).reshape(3, -1)
    ref = torch.mean(torch.abs(
        torch.cumsum(F.softmax(tp, dim=1), dim=1)
        - torch.cumsum(F.softmax(tt, dim=1), dim=1))).item()
    # NHWC flattening permutes pixel order, but softmax/cumsum are order-
    # sensitive → compare on matching (NCHW-flattened) order.
    out = float(emd_loss(jnp.asarray(_nchw(p).reshape(3, -1)),
                         jnp.asarray(_nchw(t).reshape(3, -1))))
    assert abs(ref - out) < 1e-6


# ---------------------------------------------------------------- SSIM / PSNR

def _ssim_scipy(x, y, window, max_val=1.0):
    """Independent implementation: scipy correlate + explicit Gaussian."""
    from scipy.ndimage import correlate

    ax = np.arange(window) - (window - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    k = np.outer(g, g)

    def blur(im):
        # scipy 'mirror' == torch/jnp 'reflect' (edge-excluding reflection)
        return correlate(im, k, mode="mirror")

    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    maps = []
    for b in range(x.shape[0]):
        for c in range(x.shape[-1]):
            xa, ya = x[b, :, :, c].astype(np.float64), y[b, :, :, c].astype(np.float64)
            mx, my = blur(xa), blur(ya)
            sx = blur(xa * xa) - mx * mx
            sy = blur(ya * ya) - my * my
            sxy = blur(xa * ya) - mx * my
            maps.append(((2 * mx * my + c1) * (2 * sxy + c2))
                        / ((mx * mx + my * my + c1) * (sx + sy + c2)))
    return np.mean(maps)


@pytest.mark.parametrize("window", [5, 11])
def test_ssim_against_independent_impl(window):
    x = _rand((2, 24, 24, 1), 5)
    y = np.clip(x + 0.05 * np.random.default_rng(6).standard_normal(x.shape).astype(np.float32), 0, 1)
    ref = _ssim_scipy(x, y, window)
    out = float(ssim(jnp.asarray(x), jnp.asarray(y), window).mean())
    assert abs(ref - out) < 1e-4


def test_ssim_identity_and_loss():
    x = _rand((1, 32, 32, 1), 7)
    assert abs(float(ssim(jnp.asarray(x), jnp.asarray(x), 11).mean()) - 1.0) < 1e-5
    assert float(ssim_loss(jnp.asarray(x), jnp.asarray(x))) < 1e-5


def test_psnr_matches_formula():
    x, y = _rand((1, 16, 16, 1), 8), _rand((1, 16, 16, 1), 9)
    mse = np.mean((x - y) ** 2)
    assert abs(float(psnr(jnp.asarray(x), jnp.asarray(y))) - 10 * np.log10(1.0 / mse)) < 1e-4


def test_calculate_metrics_keys():
    x, y = _rand((2, 16, 16, 1), 10), _rand((2, 16, 16, 1), 11)
    m = calculate_metrics(jnp.asarray(x), jnp.asarray(y), phase="val")
    assert set(m) == {"val/L1", "val/L2", "val/PSNR", "val/SSIM"}


# ---------------------------------------------------------------- RS indices

@pytest.mark.skipif(ref_rs is None, reason="reference checkout not present")
@pytest.mark.parametrize("criterion", ["l1", "l2"])
def test_rs_index_losses_match_reference(criterion):
    rgb, nir, nirp = _rand((2, 20, 20, 3), 12), _rand((2, 20, 20, 1), 13), _rand((2, 20, 20, 1), 14)
    t_args = tuple(torch.from_numpy(_nchw(a)) for a in (rgb, nir, nirp))
    j_args = tuple(jnp.asarray(a) for a in (rgb, nir, nirp))

    ref_obj = ref_rs.RemoteSensingIndices(mode="loss", criterion=criterion)
    our_obj = RemoteSensingIndices(mode="loss", criterion=criterion)
    for name in ["ndvi", "ndwi", "gndvi", "savi", "msavi", "evi"]:
        ref_v = getattr(ref_obj, f"{name}_calculation")(*t_args).item()
        out_v = float(getattr(our_obj, f"{name}_calculation")(*j_args))
        assert abs(ref_v - out_v) < 2e-5 * max(1.0, abs(ref_v)), (name, ref_v, out_v)


@pytest.mark.skipif(ref_rs is None, reason="reference checkout not present")
def test_rs_weighted_loss_and_logging_dict_match_reference():
    rgb, nir, nirp = _rand((1, 16, 16, 3), 15), _rand((1, 16, 16, 1), 16), _rand((1, 16, 16, 1), 17)
    t_args = tuple(torch.from_numpy(_nchw(a)) for a in (rgb, nir, nirp))
    j_args = tuple(jnp.asarray(a) for a in (rgb, nir, nirp))

    ref_obj = ref_rs.RemoteSensingIndices()
    our_obj = RemoteSensingIndices()
    assert abs(ref_obj.get_and_weight_losses(*t_args).item()
               - float(our_obj.get_and_weight_losses(*j_args))) < 2e-5

    ref_d = ref_obj.get_and_weight_losses(*t_args, loss_config=None, mode="logging_dict")
    out_d = our_obj.get_and_weight_losses(*j_args, loss_config=None, mode="logging_dict")
    assert set(ref_d) == set(out_d)
    for k in ref_d:
        assert abs(ref_d[k].item() - float(out_d[k])) < 2e-5, k


def test_rs_index_mode_returns_pair():
    rgb, nir, nirp = _rand((1, 8, 8, 3), 18), _rand((1, 8, 8, 1), 19), _rand((1, 8, 8, 1), 20)
    obj = RemoteSensingIndices(mode="index")
    a, b = obj.ndvi_calculation(jnp.asarray(rgb), jnp.asarray(nir), jnp.asarray(nirp))
    assert a.shape == (1, 8, 8, 1) and b.shape == (1, 8, 8, 1)


# ---------------------------------------------------------------------------
# kornia 0.7.3 transcription oracle (the reference pins kornia==0.7.3;
# kornia itself is not installed here).  This is a literal torch port of
# kornia/metrics/ssim.py's `ssim` at that tag: 2-D Gaussian window
# (outer product of 1-D kernels centred on (ws-1)/2, sigma 1.5), filter2d
# with reflect 'same' padding, E[x^2]-E[x]^2 variances, num/(den + 1e-12).

def _kornia_gaussian1d(ws, sigma=1.5):
    x = torch.arange(ws, dtype=torch.float32) - ws // 2
    if ws % 2 == 0:
        x = x + 0.5
    g = torch.exp(-x.pow(2) / (2 * sigma ** 2))
    return g / g.sum()


def _kornia_filter2d(x, kernel2d):
    ws = kernel2d.shape[-1]
    pad = ws // 2
    b, c, h, w = x.shape
    xp = F.pad(x, (pad, pad, pad, pad), mode="reflect")
    k = kernel2d.expand(c, 1, ws, ws)
    return F.conv2d(xp, k, groups=c)


def _kornia_073_ssim(img1, img2, ws, max_val=1.0, eps=1e-12):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    g = _kornia_gaussian1d(ws)
    kernel = (g[:, None] @ g[None, :])[None]
    mu1 = _kornia_filter2d(img1, kernel)
    mu2 = _kornia_filter2d(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    sigma1_sq = _kornia_filter2d(img1 ** 2, kernel) - mu1_sq
    sigma2_sq = _kornia_filter2d(img2 ** 2, kernel) - mu2_sq
    sigma12 = _kornia_filter2d(img1 * img2, kernel) - mu1_mu2
    num = (2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return num / (den + eps)


@pytest.mark.parametrize("window", [5, 11])
def test_ssim_matches_kornia_073_transcription(window):
    """Full SSIM *map* (not just the mean) vs the kornia 0.7.3 oracle —
    closes the PARITY.md 'SSIM oracle-validated only' deviation."""
    rng = np.random.default_rng(17)
    x = rng.random((2, 1, 24, 26)).astype(np.float32)
    y = np.clip(x + 0.15 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    ref = _kornia_073_ssim(torch.from_numpy(x), torch.from_numpy(y), window).numpy()
    out = ssim(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
               jnp.asarray(np.transpose(y, (0, 2, 3, 1))), window)
    np.testing.assert_allclose(ref, np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               rtol=1e-5, atol=1e-6)

    # and the loss exactly as the reference composes it (utils/losses.py:27)
    ref_loss = float(1.0 - _kornia_073_ssim(torch.from_numpy(x),
                                            torch.from_numpy(y), 11).mean())
    out_loss = float(ssim_loss(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                               jnp.asarray(np.transpose(y, (0, 2, 3, 1)))))
    assert abs(ref_loss - out_loss) < 1e-6


def test_ssim_matches_kornia_fixture():
    """Real-library cross-check: compares against a fixture generated by
    actual kornia (tests/golden/generate_kornia_ssim.py — run it once in
    any environment that has kornia; this container cannot, zero egress).
    Skips while the fixture is absent; the transcription + scipy oracles
    above carry the in-container validation either way."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", "ssim_kornia.npz")
    if not os.path.exists(path):
        pytest.skip("kornia fixture not generated (needs a kornia install; "
                    "see tests/golden/generate_kornia_ssim.py)")
    data = np.load(path)
    x = np.transpose(data["x"], (0, 2, 3, 1))
    y = np.transpose(data["y"], (0, 2, 3, 1))
    for ws in (5, 7, 11):
        ref = data[f"ssim_w{ws}"]
        out = np.transpose(np.asarray(
            ssim(jnp.asarray(x), jnp.asarray(y), ws)), (0, 3, 1, 2))
        np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-6)
