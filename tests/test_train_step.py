"""Fused GAN train-step tests: learning behaviour, metric schema parity,
SatCLIP routing, multi-device data parallelism on the virtual CPU mesh, and
the public predict API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nirgan_tpu.config import load_config
from nirgan_tpu.parallel import create_mesh, replicate, shard_batch
from nirgan_tpu.tasks import Px2PxTask


def small_config(satclip=False):
    cfg = load_config("configs/config_px2px_SatCLIP.yaml" if satclip
                      else "configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.train_metrics_every = 1   # metrics at every step for assertions
    return cfg


def test_train_metric_cadence():
    """Default cadence matches the reference (every 10th batch,
    model/pix2pix.py:183-186): skipped steps carry NaN for train/* only."""
    cfg = small_config()
    cfg.tpu.train_metrics_every = 10
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=32)
    step = task.make_train_step()
    ex = task.extract_batch(fake_batch())
    for i in range(10):
        state, m = step(state, ex)
        computed = (i + 1) % 10 == 0
        assert np.isfinite(float(m["train/L1"])) == computed, i
        assert np.isfinite(float(m["train/SSIM"])) == computed, i
        # losses are never skipped
        assert np.isfinite(float(m["model_loss/generator_total_loss"]))


def fake_batch(b=4, size=32, coords=False, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.random((b, 3, size, size), dtype=np.float32)
    # correlated target so there is something to learn
    nir = (0.5 * rgb[:, 0:1] + 0.3 * rgb[:, 1:2] + 0.1).astype(np.float32)
    batch = {"rgb": rgb, "nir": nir}
    if coords:
        batch["coords"] = rng.uniform(-90, 90, size=(b, 2)).astype(np.float32)
    return batch


EXPECTED_KEYS = {
    "model_loss/discriminator_predFake", "model_loss/discriminator_predReal",
    "model_loss/discriminator_fake", "model_loss/discriminator_real",
    "model_loss/discriminator_loss", "model_loss/generator_GAN_loss",
    "model_loss/generator_L1", "model_loss/generator_total_loss",
    "train/L1", "train/L2", "train/PSNR", "train/SSIM",
}


def test_train_step_learns():
    task = Px2PxTask(small_config())
    state = task.init_state(seed=0, image_size=32)
    step = task.make_train_step()
    ex = task.extract_batch(fake_batch())

    _, m0 = step(state, ex)
    state = task.init_state(seed=0, image_size=32)
    l1_first = None
    for i in range(30):
        state, m = step(state, ex)
        if l1_first is None:
            l1_first = float(m["train/L1"])
    assert EXPECTED_KEYS <= set(m)
    assert np.isfinite(float(m["model_loss/generator_total_loss"]))
    assert float(m["train/L1"]) < l1_first * 0.7, (l1_first, float(m["train/L1"]))
    assert int(state.step) == 30


def test_train_step_satclip_inject():
    task = Px2PxTask(small_config(satclip=True))
    assert task.satclip and task.satclip_style == "inject"
    state = task.init_state(seed=0, image_size=32)
    step = task.make_train_step()
    ex = task.extract_batch(fake_batch(coords=True))
    assert "embeds" in ex and ex["embeds"].shape == (4, 256)
    s0 = float(state.params_g["scale_param"])
    for _ in range(3):
        state, m = step(state, ex)
    assert "scale_param" in m
    assert float(state.params_g["scale_param"]) != s0  # learnable scale moves


def test_train_step_multidevice():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = create_mesh(("data",))
    task = Px2PxTask(small_config())
    state = replicate(mesh, task.init_state(seed=0, image_size=32))
    step = task.make_train_step(mesh=mesh)
    ex = shard_batch(mesh, task.extract_batch(fake_batch(b=8)))
    for _ in range(2):
        state, m = step(state, ex)
    assert np.isfinite(float(m["model_loss/generator_total_loss"]))
    # params stay replicated across the mesh
    assert state.params_g["c0"]["kernel"].sharding.is_fully_replicated


def test_data_parallel_matches_single_device():
    """Sharded-batch gradients must equal the single-device computation."""
    mesh = create_mesh(("data",))
    task = Px2PxTask(small_config())
    batch = fake_batch(b=8)

    s1 = task.init_state(seed=0, image_size=32)
    step1 = task.make_train_step()
    s1, m1 = step1(s1, task.extract_batch(batch))

    s8 = replicate(mesh, task.init_state(seed=0, image_size=32))
    step8 = task.make_train_step(mesh=mesh)
    s8, m8 = step8(s8, shard_batch(mesh, task.extract_batch(batch)))

    np.testing.assert_allclose(float(m1["train/L1"]), float(m8["train/L1"]), rtol=1e-5)
    g1 = np.asarray(s1.params_g["c0"]["kernel"])
    g8 = np.asarray(s8.params_g["c0"]["kernel"])
    np.testing.assert_allclose(g1, g8, rtol=1e-4, atol=1e-6)


def test_eval_step_and_predict():
    task = Px2PxTask(small_config())
    state = task.init_state(seed=0, image_size=32)
    ev = task.make_eval_step()
    ex = task.extract_batch(fake_batch())
    pred, m = ev(state, ex)
    assert pred.shape == (4, 32, 32, 1)
    assert set(m) == {"val/L1", "val/L2", "val/PSNR", "val/SSIM"}

    task.bind(state)
    out = task.predict_step(fake_batch(b=2, size=30)["rgb"])  # odd size → bucketed
    assert out.shape == (2, 1, 30, 30)
    assert np.all(np.abs(out) <= 1.0 + 1e-5)


def test_predict_requires_coords_for_satclip():
    task = Px2PxTask(small_config(satclip=True))
    task.bind(task.init_state(seed=0, image_size=32))
    with pytest.raises(ValueError, match="coords"):
        task.predict_step(np.zeros((1, 3, 32, 32), np.float32))


def test_uint16_dn_ingest_matches_f32(tmp_path):
    """uint16-DN batches transfer as integers and are scaled DN/10000 on
    device inside the step — same losses as the pre-scaled f32 path
    (ROADMAP 'input ingest' bullet)."""
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=32)
    step = task.make_train_step()

    rng = np.random.default_rng(0)
    dn = rng.integers(0, 10000, (2, 3, 32, 32)).astype(np.uint16)
    dn_nir = rng.integers(0, 10000, (2, 1, 32, 32)).astype(np.uint16)

    exd = task.extract_batch({"rgb": dn, "nir": dn_nir})
    assert exd["rgb"].dtype == np.uint16  # integers survive to device_put
    _, m_int = step(state, exd)

    exf = task.extract_batch({"rgb": dn.astype(np.float32) / 10000.0,
                              "nir": dn_nir.astype(np.float32) / 10000.0})
    _, m_f32 = step(task.init_state(seed=0, image_size=32), exf)
    for k in ("model_loss/generator_total_loss", "model_loss/discriminator_loss"):
        assert abs(float(m_int[k]) - float(m_f32[k])) < 1e-5, k


def test_transfer_dtype_f16_close_to_f32():
    """tpu.transfer_dtype float16 (host→device ingest cast, upload-bound
    tunnel/DCN links) changes losses only at input-quantisation level."""
    results = {}
    for td in (None, "float16"):
        cfg = small_config()
        if td:
            cfg.tpu.transfer_dtype = td
        task = Px2PxTask(cfg)
        state = task.init_state(seed=0, image_size=32)
        step = task.make_train_step()
        ex = task.extract_batch(fake_batch())
        if td:
            assert ex["rgb"].dtype == np.float16
            assert ex["nir"].dtype == np.float16
        for _ in range(3):
            state, m = step(state, ex)
        results[td] = float(m["model_loss/generator_total_loss"])
    assert np.isfinite(results["float16"])
    assert abs(results["float16"] - results[None]) < 2e-2 * max(1.0, abs(results[None]))
