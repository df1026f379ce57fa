"""SatCLIP location-encoder tests: SH parity vs the reference closed-form
implementation, the analytic-convention correction, SIREN init statistics,
and float32-on-device adequacy vs the float64 host path."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.conftest import load_reference_module
from nirgan_tpu.models.satclip.location_encoder import LocationEncoder
from nirgan_tpu.models.satclip.spherical_harmonics import sh_features

ref_sh = load_reference_module(
    "model/satclip/positional_encoding/spherical_harmonics_closed_form.py",
    "ref_sh_closed_form")


def _coords(n=64, seed=0):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    return np.stack([lon, lat], axis=-1)


@pytest.mark.skipif(ref_sh is None, reason="reference checkout not present")
def test_sh_closed_form_parity():
    """Our closed-form features == reference SH(m,l,φ,θ) loop
    (spherical_harmonics.py:27-42 semantics)."""
    c = _coords()
    phi = torch.deg2rad(torch.from_numpy(c[:, 0] + 180))
    theta = torch.deg2rad(torch.from_numpy(c[:, 1] + 90))
    L = 10
    ref = []
    for l in range(L):
        for m in range(-l, l + 1):
            y = ref_sh.SH(m, l, phi, theta)
            if isinstance(y, float):
                y = y * torch.ones_like(phi)
            ref.append(y.numpy())
    ref = np.stack(ref, axis=-1)

    ours = sh_features(c, legendre_polys=L, convention="closed-form")
    np.testing.assert_allclose(ref, ours, rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(ref_sh is None, reason="reference checkout not present")
def test_analytic_convention_correction():
    """analytic = closed-form × (π on m=0; (−1)^|m| otherwise) — the sympy
    generator's formula (spherical_harmonics_generate_ylms.py:21-33)."""
    c = _coords(16, seed=1)
    L = 4
    cf = np.asarray(sh_features(c, L, "closed-form"))
    an = np.asarray(sh_features(c, L, "analytic"))
    i = 0
    for l in range(L):
        for m in range(-l, l + 1):
            factor = np.pi if m == 0 else (-1.0) ** abs(m)
            np.testing.assert_allclose(an[:, i], cf[:, i] * factor, rtol=1e-12)
            i += 1


def test_analytic_matches_sympy_generated():
    """Spot-check the analytic convention against formulas generated exactly
    the way the reference's sympy script writes them (if sympy is present)."""
    sympy = pytest.importorskip("sympy")
    from sympy import assoc_legendre, cos, sin, sqrt, pi, factorial, Abs, Symbol, lambdify

    theta_s, phi_s = Symbol("theta"), Symbol("phi")

    def calc_ylm(l, m):
        if m < 0:
            Plm = assoc_legendre(l, Abs(m), cos(theta_s))
            Plm_bar = sqrt(((2 * l + 1) / (4 * pi)) * (factorial(l - Abs(m)) / factorial(l + Abs(m)))) * Plm
            return (-1) ** m * sqrt(2) * Plm_bar * sin(Abs(m) * phi_s)
        if m == 0:
            return sqrt((2 * l + 1) / 4 * pi) * assoc_legendre(l, m, cos(theta_s))
        Plm = assoc_legendre(l, m, cos(theta_s))
        Plm_bar = sqrt(((2 * l + 1) / (4 * pi)) * (factorial(l - m) / factorial(l + m))) * Plm
        return (-1) ** m * sqrt(2) * Plm_bar * cos(m * phi_s)

    c = _coords(8, seed=2)
    phi = np.deg2rad(c[:, 0] + 180)
    theta = np.deg2rad(c[:, 1] + 90)
    ours = np.asarray(sh_features(c, 4, "analytic"))
    i = 0
    for l in range(4):
        for m in range(-l, l + 1):
            f = lambdify((theta_s, phi_s), calc_ylm(l, m), "numpy")
            expected = np.broadcast_to(np.asarray(f(theta, phi), np.float64), phi.shape)
            np.testing.assert_allclose(ours[:, i], expected, rtol=1e-9, atol=1e-10)
            i += 1


def test_siren_forward_matches_torch():
    """Encoder forward == a torch transcription of the SIREN maths
    (sine(w0·Wx+b) layers, linear head — location_encoder.py:98-151)."""
    enc = LocationEncoder.create(seed=0)
    c = _coords(32, seed=3)
    ours = enc.encode(c)

    feats = sh_features(np.asarray(c, np.float64), 10, "analytic")
    x = torch.from_numpy(np.asarray(feats))
    for i, (w, b) in enumerate(enc.weights):
        w0 = 30.0 if i == 0 else 1.0
        x = x @ torch.from_numpy(w) + torch.from_numpy(b)
        if i < len(enc.weights) - 1:
            x = torch.sin(w0 * x)
    np.testing.assert_allclose(x.numpy().astype(np.float32), ours, rtol=1e-6)


def test_encoder_scale_matches_reference():
    """README.md:72: ≈400 k params, 256-d output."""
    enc = LocationEncoder.create()
    assert enc.embed_dim == 256
    assert 100_000 < enc.param_count() < 500_000
    assert enc.encode(_coords(4)).shape == (4, 256)
    assert enc.encode(_coords(4)).dtype == np.float32


def test_f32_vs_f64_adequacy():
    """Device (f32) path vs host (f64) path — validates SURVEY.md §7.3's
    'float32 adequacy' requirement for on-device SatCLIP."""
    enc = LocationEncoder.create(seed=0)
    c = _coords(64, seed=4)
    e64 = enc.encode(c)
    e32 = np.asarray(enc.encode_jax(jnp.asarray(c, jnp.float32)))
    scale = np.abs(e64).max()
    assert np.abs(e64 - e32).max() / scale < 5e-4


def test_torch_state_dict_roundtrip():
    """from_torch_state_dict maps (out,in) torch weights correctly."""
    enc = LocationEncoder.create(seed=5)
    sd = {}
    for i, (w, b) in enumerate(enc.weights[:-1]):
        sd[f"model.location.nnet.layers.{i}.weight"] = w.T
        sd[f"model.location.nnet.layers.{i}.bias"] = b
    sd["model.location.nnet.last_layer.weight"] = enc.weights[-1][0].T
    sd["model.location.nnet.last_layer.bias"] = enc.weights[-1][1]
    enc2 = LocationEncoder.from_torch_state_dict(sd)
    c = _coords(8, seed=6)
    np.testing.assert_allclose(enc.encode(c), enc2.encode(c), rtol=0, atol=0)


def test_wrapper_loads_real_torch_ckpt(tmp_path):
    """SatClipWrapper must read an actual Lightning-format .ckpt file:
    hyper_parameters drive the architecture, state_dict the weights
    (reference load.py:3-17 semantics)."""
    import torch

    enc = LocationEncoder.create(seed=9)
    sd = {}
    for i, (w, b) in enumerate(enc.weights[:-1]):
        sd[f"model.location.nnet.layers.{i}.weight"] = torch.from_numpy(w.T.copy())
        sd[f"model.location.nnet.layers.{i}.bias"] = torch.from_numpy(b.copy())
    sd["model.location.nnet.last_layer.weight"] = torch.from_numpy(enc.weights[-1][0].T.copy())
    sd["model.location.nnet.last_layer.bias"] = torch.from_numpy(enc.weights[-1][1].copy())
    ckpt = {"hyper_parameters": {"harmonics_calculation": "analytic",
                                 "legendre_polys": 10, "embed_dim": 256},
            "state_dict": sd}
    path = tmp_path / "satclip-test-l10.ckpt"
    torch.save(ckpt, str(path))

    from nirgan_tpu.models.satclip.wrapper import SatClipWrapper

    wrapper = SatClipWrapper(str(path))
    assert wrapper.loaded_from == str(path)
    c = _coords(8, seed=10)
    np.testing.assert_allclose(wrapper.predict(c), enc.encode(c), rtol=0, atol=0)


def test_weighted_spherical_harmonics():
    """WeightedSphericalHarmonics: trainable coefficient mixing equals
    feats @ C where C is built by a verbatim transcription of the
    reference's get_coeffs triangular/negative-index rule."""
    import jax
    import jax.numpy as jnp

    from nirgan_tpu.models.satclip.positional_encoding import (
        WeightedSphericalHarmonics,
    )
    from nirgan_tpu.models.satclip.spherical_harmonics import sh_features

    L, E = 4, 6
    mod = WeightedSphericalHarmonics(legendre_polys=L, embedding_dim=E)
    rng = np.random.default_rng(13)
    pts = rng.uniform([-180, -90], [180, 90], (5, 2)).astype(np.float32)
    params = mod.init(jax.random.key(0), jnp.asarray(pts))
    out = mod.apply(params, jnp.asarray(pts))
    assert out.shape == (5, E)

    w = np.asarray(params["params"]["weight"])

    def get_coeffs(l, m):  # reference spherical_harmonics_weighted.py verbatim
        if m == 0:
            return w[l, 0]
        if m > 0:
            return w[l, m]
        return w[-l, m]

    rows = [get_coeffs(l, m) for l in range(L) for m in range(-l, l + 1)]
    feats = np.asarray(sh_features(pts, L, "closed-form"))
    want = feats @ np.stack(rows)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    # trainable end-to-end: gradient flows into the weight
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, jnp.asarray(pts)) ** 2))(params)
    assert float(np.abs(np.asarray(g["params"]["weight"])).max()) > 0
