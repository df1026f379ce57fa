"""Cross-stack TRAIN-STEP parity (VERDICT round-2 missing item 1; SURVEY
§7.3 hard part 2).

The framework's strongest claim is that the fused single-forward GAN step
(D on ``stop_gradient(pred)``, G through the updated D, one shared
``jax.vjp``) reproduces the reference's PL-1.9 alternating-optimizer
scheme (``/root/reference/model/pix2pix.py:165-257``, optimizer order
[optim_d, optim_g] at ``:485-492``).  This test proves it end-to-end:

  * identical converted weights + an identical batch go into BOTH stacks,
  * the torch side runs the reference's exact alternation — fresh generator
    forward per optimizer_idx, D stepped first, fresh G forward through the
    *updated* D — with the reference's own ``networks.py`` modules and
    ``GANLoss`` (PL itself is not in the image; the alternation loop below
    is the behavioural transcription of ``training_step`` + PL 1.9's
    optimizer cycling, each line cited),
  * every ``model_loss/*`` term is compared per step, and
  * the one-forward-vs-two updated-weight drift is bounded over 3 steps.

Why they should agree exactly (up to f32 reassociation): with instance
norm (stateless) and dropout off, the reference's two generator forwards
within one batch see identical G params and produce identical ``pred``;
its D update detaches ``pred`` (= our stop_gradient), and its G backward
runs through the already-stepped D (= our ``params_d`` after the fused
D-update).  torch Adam(lr, (0.5, 0.999), eps=1e-8) ≡ optax scale_by_adam
with the same constants (``train/state.py:34-38``).
"""

import os

import numpy as np
import pytest
import torch

import jax

from tests.conftest import REPO_ROOT, load_reference_module

SIZE = 64
PAD = 4
LAMBDA_GAN, LAMBDA_L1 = 1.0, 100.0
LR, BETA1 = 2e-4, 0.5
N_STEPS = 3


def _batch(seed=0, n=2):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 3, SIZE // 8, SIZE // 8)).astype(np.float32)
    rgb = torch.nn.functional.interpolate(
        torch.from_numpy(base), size=(SIZE, SIZE), mode="bicubic",
        align_corners=False).clamp(0, 1)
    nir = (0.6 * rgb[:, 1:2] + 0.4 * rgb[:, 2:3]).clamp(0, 1)
    return rgb, nir


def _torch_alternation(networks, netG, netD, rgb, nir, n_steps):
    """The reference training loop: PL 1.9 calls training_step once per
    optimizer_idx with a FRESH forward each time (pix2pix.py:178-180), and
    cycles optimizers in the configured order [optim_d, optim_g]
    (pix2pix.py:490-492)."""
    crit = networks.GANLoss("lsgan")
    l1 = torch.nn.L1Loss()
    optim_d = torch.optim.Adam(netD.parameters(), lr=LR, betas=(BETA1, 0.999))
    optim_g = torch.optim.Adam(netG.parameters(), lr=LR, betas=(BETA1, 0.999))

    def forward():  # reference forward: reflect-pad, net, crop (pix2pix.py:91-108)
        x = torch.nn.functional.pad(rgb, (PAD,) * 4, mode="reflect")
        return netG(x)[:, :, PAD:-PAD, PAD:-PAD]

    logs = []
    for _ in range(n_steps):
        m = {}
        # --- optimizer_idx 0: discriminator (pix2pix.py:194-210)
        pred = forward()
        fake_ab = torch.cat((rgb, pred), 1)
        pred_fake = netD(fake_ab.detach())
        m["model_loss/discriminator_predFake"] = float(pred_fake.mean())
        loss_d_fake = crit(pred_fake, False)
        real_ab = torch.cat((rgb, nir), 1)
        pred_real = netD(real_ab)
        m["model_loss/discriminator_predReal"] = float(pred_real.mean())
        loss_d_real = crit(pred_real, True)
        loss_d = loss_d_fake + loss_d_real          # no ×0.5 (pix2pix.py:206)
        m["model_loss/discriminator_fake"] = float(loss_d_fake)
        m["model_loss/discriminator_real"] = float(loss_d_real)
        m["model_loss/discriminator_loss"] = float(loss_d)
        optim_d.zero_grad()
        loss_d.backward()
        optim_d.step()

        # --- optimizer_idx 1: generator, fresh forward, UPDATED D
        #     (pix2pix.py:215-257)
        pred = forward()
        pred_fake = netD(torch.cat((rgb, pred), 1))
        loss_g_gan = crit(pred_fake, True)
        loss_g_l1 = l1(pred, nir)
        loss_g = loss_g_gan * LAMBDA_GAN + loss_g_l1 * LAMBDA_L1
        m["model_loss/generator_GAN_loss"] = float(loss_g_gan)
        m["model_loss/generator_L1"] = float(loss_g_l1)
        m["model_loss/generator_total_loss"] = float(loss_g)
        optim_g.zero_grad()
        loss_g.backward()
        optim_g.step()
        logs.append(m)
    return logs


@pytest.fixture(scope="module")
def parity_run():
    networks = load_reference_module("model/networks.py", "ref_networks_tsp")
    if networks is None:
        pytest.skip("reference checkout not present")

    torch.manual_seed(0)
    norm = networks.get_norm_layer("instance")
    netG = networks.ResnetGenerator(3, 1, 8, norm_layer=norm,
                                    use_dropout=False, n_blocks=6)
    netD = networks.NLayerDiscriminator(4, 8, n_layers=3, norm_layer=norm)
    netG.train()
    netD.train()

    sd = {f"netG.{k}": v.detach().numpy().copy()
          for k, v in netG.state_dict().items()}
    sd.update({f"netD.{k}": v.detach().numpy().copy()
               for k, v in netD.state_dict().items()})

    rgb, nir = _batch()

    # --- JAX fused step on the SAME weights and batch
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    cfg = load_config(os.path.join(REPO_ROOT, "configs/config_px2px.yaml"))
    cfg.base_configs.netG = "resnet_6blocks"
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.base_configs.no_dropout = True
    cfg.base_configs.lambda_GAN = LAMBDA_GAN
    cfg.base_configs.lambda_L1 = LAMBDA_L1
    cfg.base_configs.lr = LR
    cfg.Data.padding_amount = PAD
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.train_metrics_every = 1
    cfg.tpu.shape_buckets = [SIZE]
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=SIZE)
    conv = task.load_torch_weights(sd)
    state = state.replace(
        params_g=merge_params(jax.device_get(state.params_g), conv["params_g"]),
        params_d=merge_params(jax.device_get(state.params_d), conv["params_d"]))
    step = task.make_train_step()
    batch = task.extract_batch({"rgb": rgb.numpy(), "nir": nir.numpy()})

    jax_logs = []
    for _ in range(N_STEPS):
        state, metrics = step(state, batch)
        jax_logs.append({k: float(v) for k, v in
                         jax.device_get(metrics).items()})

    torch_logs = _torch_alternation(networks, netG, netD, rgb, nir, N_STEPS)

    # post-training torch weights, converted for tree-wise comparison
    sd_after = {f"netG.{k}": v.detach().numpy().copy()
                for k, v in netG.state_dict().items()}
    sd_after.update({f"netD.{k}": v.detach().numpy().copy()
                     for k, v in netD.state_dict().items()})
    conv_after = task.load_torch_weights(sd_after)
    return task, state, jax_logs, torch_logs, conv_after, (rgb, nir), netG


LOSS_KEYS = [
    "model_loss/discriminator_predFake",
    "model_loss/discriminator_predReal",
    "model_loss/discriminator_fake",
    "model_loss/discriminator_real",
    "model_loss/discriminator_loss",
    "model_loss/generator_GAN_loss",
    "model_loss/generator_L1",
    "model_loss/generator_total_loss",
]


def test_all_loss_terms_agree_step1(parity_run):
    """Every model_loss/* term of the FIRST step (identical weights in both
    stacks) agrees to ~f32 precision."""
    _, _, jax_logs, torch_logs, *_ = parity_run
    for k in LOSS_KEYS:
        np.testing.assert_allclose(
            jax_logs[0][k], torch_logs[0][k], rtol=2e-5, atol=2e-6,
            err_msg=f"step 1 {k}")


def test_loss_terms_track_over_steps(parity_run):
    """Loss terms keep agreeing over subsequent steps — i.e. the two
    optimization trajectories are the same trajectory, not two that merely
    start together."""
    _, _, jax_logs, torch_logs, *_ = parity_run
    for s in range(1, N_STEPS):
        for k in LOSS_KEYS:
            np.testing.assert_allclose(
                jax_logs[s][k], torch_logs[s][k], rtol=5e-4, atol=5e-5,
                err_msg=f"step {s + 1} {k}")


def test_updated_weights_drift_bounded(parity_run):
    """After N_STEPS the parameter trees agree entrywise wherever the
    gradient is meaningful; the only divergent entries are
    negligible-gradient parameters — conv biases absorbed by the following
    affine-free InstanceNorm (mathematically zero gradient; the torch
    reference trains the same dead parameters) — where Adam normalises f32
    noise to a ±lr step of arbitrary sign in ANY two float implementations.
    Even those stay inside the ±lr·N Adam envelope."""
    import jax.numpy as jnp

    from nirgan_tpu.losses import gan_loss, l1_loss
    from nirgan_tpu.tasks.px2px import nchw_to_nhwc

    task, state, _, _, conv_after, (rgb, nir), _ = parity_run
    rgb_nhwc = nchw_to_nhwc(rgb.numpy())
    nir_nhwc = nchw_to_nhwc(nir.numpy())
    pg0 = conv_after["params_g"]  # any same-structure point works for grads;
    pd0 = conv_after["params_d"]  # dead params are dead everywhere

    def g_loss_fn(pg):
        pred, _ = task._g_apply(pg, rgb_nhwc, train=True)
        fake = jnp.concatenate([rgb_nhwc, pred], -1)
        logits = task.d_apply(pd0, fake, train=True)
        return (gan_loss(logits, True, "lsgan") * LAMBDA_GAN
                + l1_loss(pred, nir_nhwc) * LAMBDA_L1)

    def d_loss_fn(pd):
        pred, _ = task._g_apply(pg0, rgb_nhwc, train=False)
        fake = jnp.concatenate([rgb_nhwc, jax.lax.stop_gradient(pred)], -1)
        real = jnp.concatenate([rgb_nhwc, nir_nhwc], -1)
        return (gan_loss(task.d_apply(pd, fake, train=True), False, "lsgan")
                + gan_loss(task.d_apply(pd, real, train=True), True, "lsgan"))

    grads = {"G": jax.device_get(jax.grad(g_loss_fn)(pg0)),
             "D": jax.device_get(jax.grad(d_loss_fn)(pd0))}
    envelope = 2.5 * LR * N_STEPS  # Adam |update| <= ~lr/step early on
    for name, ours_tree, theirs_tree in (
            ("G", state.params_g, conv_after["params_g"]),
            ("D", state.params_d, conv_after["params_d"])):
        flat_o = jax.tree.leaves(jax.device_get(ours_tree))
        flat_t = jax.tree.leaves(theirs_tree)
        flat_g = jax.tree.leaves(grads[name])
        assert len(flat_o) == len(flat_t) == len(flat_g)
        gmax = max(float(np.max(np.abs(np.asarray(g)))) for g in flat_g)
        all_d = []
        for a, b, g in zip(flat_o, flat_t, flat_g):
            d = np.abs(np.asarray(a) - np.asarray(b))
            all_d.append(d.ravel())
            assert float(d.max()) <= envelope, (name, float(d.max()))
            high = d > 1e-4
            if high.any():
                # drift beyond f32 accumulation only on entries carrying
                # < 0.1% of the gradient scale (measured: the offenders are
                # the IN-absorbed biases at ~1e-7 of scale, plus a handful
                # of kernel entries at ~1e-4 of it)
                worst_g = float(np.max(np.abs(np.asarray(g))[high]))
                assert worst_g <= 1e-3 * gmax, (name, worst_g, gmax)
        d = np.concatenate(all_d)
        # the bulk of both trees is bit-close
        assert float(np.quantile(d, 0.99)) < 5e-5, name
        assert float(np.median(d)) < 1e-5, name


def test_post_training_forward_parity(parity_run):
    """The two stacks' generators, after training independently for
    N_STEPS, still produce the same image (>= 60 dB PSNR agreement)."""
    task, state, _, _, _, (rgb, nir), netG = parity_run
    netG.eval()
    with torch.no_grad():
        x = torch.nn.functional.pad(rgb, (PAD,) * 4, mode="reflect")
        ref_pred = netG(x)[:, :, PAD:-PAD, PAD:-PAD].numpy()
    task.bind(state)
    got = task.predict_step(rgb.numpy())
    err = float(np.mean((got - ref_pred) ** 2))
    psnr = 10 * np.log10(4.0 / max(err, 1e-12))
    assert psnr >= 60.0, psnr
