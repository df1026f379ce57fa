"""Train-step coverage for the non-default configuration axes: vanilla and
wgangp GAN modes, batch norm (running stats through the fused step),
dropout, U-Net generator, and the SatCLIP concat conditioning route."""

import numpy as np

import jax

from nirgan_tpu.config import load_config
from nirgan_tpu.tasks import Px2PxTask


def _cfg(satclip=False, **overrides):
    cfg = load_config("configs/config_px2px_SatCLIP.yaml" if satclip
                      else "configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.train_metrics_every = 1   # metrics at every step for assertions
    for k, v in overrides.items():
        cfg.base_configs[k] = v
    return cfg


def _batch(b=2, size=32, coords=False, seed=0):
    rng = np.random.default_rng(seed)
    out = {"rgb": rng.random((b, 3, size, size), dtype=np.float32),
           "nir": rng.random((b, 1, size, size), dtype=np.float32)}
    if coords:
        out["coords"] = rng.uniform(-90, 90, size=(b, 2)).astype(np.float32)
    return out


def _run_steps(cfg, n=2, coords=False, size=32):
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=size)
    step = task.make_train_step()
    ex = task.extract_batch(_batch(size=size, coords=coords))
    for _ in range(n):
        state, m = step(state, ex)
    assert np.isfinite(float(m["model_loss/generator_total_loss"]))
    return task, state, m


def test_vanilla_gan_mode():
    _, _, m = _run_steps(_cfg(gan_mode="vanilla"))
    assert float(m["model_loss/discriminator_loss"]) > 0


def test_wgangp_gan_mode():
    _, _, m = _run_steps(_cfg(gan_mode="wgangp"))
    # wgangp D loss = E[fake] - E[real]; can be negative but must be finite
    assert np.isfinite(float(m["model_loss/discriminator_loss"]))


def test_batchnorm_running_stats_update():
    cfg = _cfg(norm="batch")
    task, state, m = _run_steps(cfg, n=2)
    assert task.has_bn
    leaves_g = jax.tree.leaves(state.stats_g)
    leaves_d = jax.tree.leaves(state.stats_d)
    assert leaves_g and leaves_d
    # means have moved away from init (zeros)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves_g)
    # eval uses the running averages without error
    ev = task.make_eval_step()
    pred, vm = ev(state, task.extract_batch(_batch(seed=1)))
    assert np.isfinite(float(vm["val/L1"]))
    # predict path threads stats too
    task.bind(state)
    out = task.predict_step(_batch(seed=2)["rgb"])
    assert out.shape == (2, 1, 32, 32)


def test_dropout_training_path():
    cfg = _cfg(no_dropout=False)
    task, state, m = _run_steps(cfg, n=2)
    assert task.uses_dropout
    # deterministic eval: two predictions agree exactly
    task.bind(state)
    a = task.predict_step(_batch(seed=3)["rgb"])
    b = task.predict_step(_batch(seed=3)["rgb"])
    np.testing.assert_array_equal(a, b)


def test_unet_generator_trains():
    cfg = _cfg(netG="unet_128")
    cfg.Data.padding = False  # U-Net needs 2^num_downs-divisible inputs,
    # exactly like the torch reference
    task, state, m = _run_steps(cfg, size=128)
    assert np.isfinite(float(m["train/L1"]))


def test_satclip_concat_route():
    cfg = _cfg(satclip=True)
    cfg.satclip.satclip_style = "concat"
    task = Px2PxTask(cfg)
    assert task.satclip_style == "concat"
    state = task.init_state(seed=0, image_size=32)
    step = task.make_train_step()
    ex = task.extract_batch(_batch(coords=True))
    assert ex["rgb"].shape[-1] == 4  # embedding plane concatenated
    state, m = step(state, ex)
    assert np.isfinite(float(m["model_loss/generator_total_loss"]))
    task.bind(state)
    out = task.predict_step(_batch(coords=True)["rgb"],
                            coords=_batch(coords=True)["coords"])
    assert out.shape == (2, 1, 32, 32)
