"""The conditional-GAN task: TPU-native counterpart of the reference's
``Px2Px_PL`` LightningModule (``model/pix2pix.py:17-492``).

Key re-design vs the reference (SURVEY.md §2.9, §7.1):

  * One **fused train step**.  PL 1.9 alternating optimizers run the
    generator forward twice per batch (once per ``optimizer_idx``,
    ``model/pix2pix.py:165-257``).  Here a single ``jax.vjp`` forward is
    shared: the discriminator updates on ``stop_gradient(pred)`` first
    (optimizer order [D, G], ``model/pix2pix.py:490``), then the generator's
    cotangent flows through the *updated* discriminator and back through the
    saved vjp — mathematically identical (dropout is off and norms are
    stateless) with ~35% of the per-step FLOPs removed.
  * Everything (both losses, both Adam updates, all metric scalars) compiles
    into one XLA program; only scalars cross to the host.
  * Data parallelism is a jit sharding annotation, not a framework
    (``parallel/mesh.py``); metric means over the global batch reproduce
    ``sync_dist=True``.
  * The frozen SatCLIP tower runs float64 on host (reference runs it under
    ``no_grad`` in float64, ``satclip_wrapper.py:29-34``); embeddings enter
    the step as array inputs.

Loss algebra parity (``model/pix2pix.py:195-257``):
  D:  lsgan(fake, 0) + lsgan(real, 1)        (no ×0.5 — the PL port dropped
                                              the legacy halving, SURVEY §2)
  G:  λ_GAN·lsgan(fake, 1) + λ_L1·L1 [+ λ_ssim·SSIM + λ_hist·EMD + λ_rs·RS]
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nirgan_tpu.config import ConfigNode, tpu_section
from nirgan_tpu.losses import (
    RemoteSensingIndices,
    calculate_metrics,
    emd_loss,
    gan_loss,
    l1_loss,
    ssim_loss,
)
from nirgan_tpu.models import define_D, define_G, define_G_inject
from nirgan_tpu.models.layers import dtype_of
from nirgan_tpu.ops.pad import reflect_pad2d
from nirgan_tpu.ops.resize import resize_bicubic
from nirgan_tpu.parallel import batch_sharding, replicated_sharding
from nirgan_tpu.runtime.setup import default_compiler_options
from nirgan_tpu.train.state import TrainState, adam_for, create_state

__all__ = ["Px2PxTask"]


def nchw_to_nhwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class Px2PxTask:
    def __init__(self, config: ConfigNode):
        self.config = config
        self.opt = config.base_configs
        tpu = tpu_section(config)
        self.compute_dtype = dtype_of(tpu.compute_dtype)
        self.dn_scale = float(config.Data.get("dn_scale", 10000.0))
        # optional float transfer dtype (e.g. "float16"): float batches are
        # cast host-side before the host→device transfer and upcast on
        # device — halves ingest bytes on thin links (the axon tunnel
        # measures f32 216 ms vs f16 69 ms per 256² b8 batch, RESULTS.md);
        # quantises inputs to ~1e-3 so it is OFF by default for parity
        td = tpu.get("transfer_dtype", None)
        self.transfer_dtype = np.dtype(td) if td else None
        self.param_dtype = dtype_of(tpu.param_dtype)
        self.shape_buckets = sorted(int(b) for b in tpu.shape_buckets)
        # reference computes train metrics every 10th batch only
        # (model/pix2pix.py:183-186); the suite costs 5.8 ms/step at 256² b8
        # (benchmarks/train_breakdown2.py) so the cadence is a real 15%
        self.train_metrics_every = int(tpu.get("train_metrics_every", 10))
        # opt-in int8 serving trunk (ops/int8_trunk.py): "int8" quantises the
        # 9-block residual trunk for inference paths — 1.62× on the trunk,
        # PSNR-guarded (tests/test_int8_trunk.py).  OFF by default: parity
        # configs serve bf16.
        self.serving_quant = str(tpu.get("serving_quant", "none"))

        sc = config.get("satclip", ConfigNode({"use_satclip": False}))
        self.satclip = bool(sc.get("use_satclip", False))
        self.satclip_style = sc.get("satclip_style", None) if self.satclip else None

        # --- generator selection (reference model/pix2pix.py:27-53)
        kw = dict(compute_dtype=self.compute_dtype, param_dtype=self.param_dtype)
        if self.satclip and self.satclip_style == "concat":
            self.netG = define_G(
                self.opt.input_nc + 1, self.opt.output_nc, self.opt.ngf, self.opt.netG,
                self.opt.norm, not self.opt.no_dropout, self.opt.init_type,
                self.opt.init_gain, **kw)
        elif self.satclip and self.satclip_style == "inject":
            self.netG = define_G_inject(config, **kw)
        elif self.satclip:
            raise NotImplementedError("SatClip Style not recognized, choose 'concat' or 'inject'")
        else:
            self.netG = define_G(
                self.opt.input_nc, self.opt.output_nc, self.opt.ngf, self.opt.netG,
                self.opt.norm, not self.opt.no_dropout, self.opt.init_type,
                self.opt.init_gain, **kw)

        # --- discriminator (reference model/pix2pix.py:57-58).  Note: we size
        # it from its true input (G-input channels + output), where the
        # reference hard-codes input_nc+output_nc — which breaks its own
        # concat style (the 4-channel conditioning + 1-channel pred is 5
        # channels into a 4-channel D).
        d_in = self.opt.input_nc + self.opt.output_nc + (
            1 if self.satclip and self.satclip_style == "concat" else 0)
        self.netD = define_D(d_in, self.opt.ndf, self.opt.netD, self.opt.n_layers_D,
                             self.opt.norm, self.opt.init_type, self.opt.init_gain, **kw)

        # --- losses
        self.gan_mode = self.opt.gan_mode
        self.lambda_gan = float(self.opt.lambda_GAN)
        self.lambda_l1 = float(self.opt.lambda_L1)
        self.lambda_ssim = float(self.opt.get("lambda_ssim", 0.0))
        self.lambda_hist = float(self.opt.get("lambda_hist", 0.0))
        self.lambda_rs = float(self.opt.get("lambda_rs_losses", 0.0))
        self.rs_losses = (
            RemoteSensingIndices(mode="loss", criterion=self.opt.rs_losses_criterium)
            if self.lambda_rs > 0.0 else None)
        self.rs_weights = (dict(self.opt.internal_rs_loss_weights)
                           if "internal_rs_loss_weights" in self.opt else None)

        # legacy Pix2PixModel halves the D loss (pix2pix_model.py:128); the
        # PL port dropped the ×0.5 (pix2pix.py:206).  Default mirrors the PL
        # port; the flag restores the legacy objective (SURVEY.md §2 row 18).
        self.legacy_halve_d_loss = bool(self.opt.get("legacy_halve_d_loss", False))

        # batch-norm nets carry running stats; dropout needs an rng stream
        # (reference supports norm: batch and no_dropout: false)
        self.has_bn = self.opt.get("norm", "instance") == "batch"
        self.uses_dropout = not self.opt.get("no_dropout", True)
        if self.serving_quant == "int8" and not self.wants_int8_serving():
            import warnings

            warnings.warn(
                "tpu.serving_quant: int8 ignored — the mode needs a resnet "
                "generator with affine-free instance norm and no dropout "
                "(ops/int8_trunk.py); serving will run the float path.")

        # --- padding (reference model/pix2pix.py:91-108)
        self.use_padding = bool(config.Data.padding)
        self.pad_amount = int(config.Data.padding_amount) if self.use_padding else 0

        # --- frozen SatCLIP tower (host-side)
        self.satclip_model = None
        if self.satclip:
            from nirgan_tpu.models.satclip import SatClipWrapper

            self.satclip_model = SatClipWrapper(sc.get("satclip_path", None))
        self.satclip_scaling_factor = float(sc.get("scaling_factor", 1.0)) if self.satclip else 1.0

    # ------------------------------------------------------------- applies
    def g_apply(self, params, rgb, embeds=None, train: bool = False,
                stats=None, rng=None, trunk_q=None):
        """Reflect-pad → generator → crop (reference forward,
        ``model/pix2pix.py:88-110``).  Stateless path (instance/none norm)."""
        pred, _ = self._g_apply(params, rgb, embeds, train, stats, rng, trunk_q)
        return pred

    def _g_apply(self, params, rgb, embeds=None, train: bool = False,
                 stats=None, rng=None, trunk_q=None):
        """Full apply: returns (pred, new_batch_stats)."""
        x = rgb
        p = self.pad_amount
        # opt-in (generator fold_input_pads=True): resnet generators fold
        # the task-level reflect pad into the blocked stem (generator.py
        # outer_pad → ops/reflect_conv.py).  Exact, but measured neutral-
        # to-slightly-slower in the real graphs (benchmarks/stemfold_ab.py)
        # so it defaults off; the generator applies the pad itself whenever
        # the fold can't take it (odd sizes, batch norm)
        fold_outer = (self.use_padding and p > 0
                      and getattr(self.netG, "reflect_fold", False)
                      and getattr(self.netG, "fold_input_pads", False))
        if self.use_padding and not fold_outer:
            x = reflect_pad2d(x, p)
        variables = {"params": params}
        if self.has_bn and stats:
            variables["batch_stats"] = stats
        rngs = ({"dropout": rng}
                if (self.uses_dropout and train and rng is not None) else None)
        args = (x, embeds) if self.satclip and self.satclip_style == "inject" else (x,)
        kw = {"trunk_q": trunk_q} if trunk_q is not None else {}
        if fold_outer:
            kw["outer_pad"] = p
        if train and self.has_bn:
            pred, mut = self.netG.apply(variables, *args, train=True,
                                        mutable=["batch_stats"], rngs=rngs,
                                        **kw)
            new_stats = mut["batch_stats"]
        else:
            pred = self.netG.apply(variables, *args, train=train, rngs=rngs, **kw)
            new_stats = stats if stats is not None else {}
        if self.use_padding:
            pred = pred[:, p:-p, p:-p, :]
        return pred, new_stats

    def d_apply(self, params, x, train: bool = False, stats=None):
        logits, _ = self._d_apply(params, x, train, stats)
        return logits

    def _d_apply(self, params, x, train: bool = False, stats=None):
        variables = {"params": params}
        if self.has_bn and stats:
            variables["batch_stats"] = stats
        if train and self.has_bn:
            logits, mut = self.netD.apply(variables, x, train=True,
                                          mutable=["batch_stats"])
            return logits, mut["batch_stats"]
        return (self.netD.apply(variables, x, train=train),
                stats if stats is not None else {})

    # --------------------------------------------------------------- init
    def init_state(self, seed: int = 0, image_size: int = 64) -> TrainState:
        k = jax.random.key(seed)
        kg, kd, kr = jax.random.split(k, 3)
        g_in = self.opt.input_nc + (1 if self.satclip and self.satclip_style == "concat" else 0)
        x = jnp.zeros((1, image_size + 2 * self.pad_amount,
                       image_size + 2 * self.pad_amount, g_in))
        if self.satclip and self.satclip_style == "inject":
            vg = self.netG.init(kg, x, jnp.zeros((1, self.satclip_model.embed_dim)))
        else:
            vg = self.netG.init(kg, x)
        d_in = g_in + self.opt.output_nc
        vd = self.netD.init(kd, jnp.zeros((1, image_size, image_size, d_in)))
        return create_state(kr, vg["params"], vd["params"], lr=float(self.opt.lr),
                            beta1=float(self.opt.beta1),
                            stats_g=vg.get("batch_stats", {}),
                            stats_d=vd.get("batch_stats", {}))

    # --------------------------------------------------------- train step
    def make_train_step(self, mesh=None):
        """Build the fused, jitted (state, batch) → (state, metrics) step.

        ``batch``: {"rgb": (B,H,W,Cg) f32, "nir": (B,H,W,1) f32
                    [, "embeds": (B,E) f32]} — already NHWC (see
        ``extract_batch``).  With a mesh, the batch is sharded on ``data``
        and state replicated; XLA inserts the gradient all-reduce.
        """
        tx_g = adam_for(self.netG, beta1=float(self.opt.beta1))
        tx_d = adam_for(self.netD, beta1=float(self.opt.beta1))
        inject = self.satclip and self.satclip_style == "inject"

        def step(state: TrainState, batch):
            rgb = self._dn_to_reflectance(batch["rgb"], self.compute_dtype)
            nir = self._dn_to_reflectance(batch["nir"], jnp.float32)
            embeds = batch.get("embeds") if inject else None
            rng, drop_rng = jax.random.split(state.rng)

            # --- single shared generator forward
            pred, g_vjp, stats_g = jax.vjp(
                lambda pg: self._g_apply(pg, rgb, embeds, train=True,
                                         stats=state.stats_g, rng=drop_rng),
                state.params_g, has_aux=True)
            pred_sg = jax.lax.stop_gradient(pred)

            # --- discriminator update (optimizer_idx 0; pix2pix.py:195-212)
            # D runs in train mode on fake then real, so batch-norm stats
            # update sequentially exactly as in torch.
            def d_loss_fn(params_d):
                fake_ab = jnp.concatenate([rgb, pred_sg], axis=-1)
                real_ab = jnp.concatenate([rgb, nir.astype(rgb.dtype)], axis=-1)
                logits_fake, st1 = self._d_apply(params_d, fake_ab, train=True,
                                                 stats=state.stats_d)
                logits_real, st2 = self._d_apply(params_d, real_ab, train=True,
                                                 stats=st1)
                loss_d_fake = gan_loss(logits_fake, False, self.gan_mode)
                loss_d_real = gan_loss(logits_real, True, self.gan_mode)
                loss_d = loss_d_fake + loss_d_real  # no ×0.5 (pix2pix.py:206)
                if self.legacy_halve_d_loss:
                    loss_d = loss_d * 0.5
                aux = {
                    "model_loss/discriminator_predFake": jnp.mean(logits_fake.astype(jnp.float32)),
                    "model_loss/discriminator_predReal": jnp.mean(logits_real.astype(jnp.float32)),
                    "model_loss/discriminator_fake": loss_d_fake,
                    "model_loss/discriminator_real": loss_d_real,
                    "model_loss/discriminator_loss": loss_d,
                }
                return loss_d, (aux, jax.lax.stop_gradient(st2))

            (_, (d_metrics, stats_d)), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d)
            upd_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
            upd_d = jax.tree.map(lambda u: u * state.lr_d, upd_d)
            params_d = jax.tree.map(lambda p, u: p + u, state.params_d, upd_d)

            # --- generator update through the *updated* D (optimizer_idx 1;
            #     PL steps D first, so G's loss sees the new D)
            def g_loss_on_pred(pred_):
                fake_ab = jnp.concatenate([rgb, pred_], axis=-1)
                logits_fake, st3 = self._d_apply(params_d, fake_ab, train=True,
                                                 stats=stats_d)
                loss_g_gan = gan_loss(logits_fake, True, self.gan_mode)
                loss_g_l1 = l1_loss(pred_, nir)
                loss_g = loss_g_gan * self.lambda_gan + loss_g_l1 * self.lambda_l1
                aux = {
                    "model_loss/generator_GAN_loss": loss_g_gan,
                    "model_loss/generator_L1": loss_g_l1,
                }
                if self.lambda_ssim > 0.0:
                    s = ssim_loss(pred_, nir)
                    aux["model_loss/generator_ssim"] = s
                    loss_g = loss_g + s * self.lambda_ssim
                if self.lambda_hist > 0.0:
                    h = emd_loss(pred_, nir)
                    aux["model_loss/generator_hist"] = h
                    loss_g = loss_g + h * self.lambda_hist
                if self.lambda_rs > 0.0:
                    rgb3 = rgb[..., : self.opt.input_nc]
                    r = self.rs_losses.get_and_weight_losses(
                        rgb3, nir, pred_, loss_config=self.rs_weights)
                    aux["model_loss/indices_loss_weighted"] = r
                    loss_g = loss_g + r * self.lambda_rs
                aux["model_loss/generator_total_loss"] = loss_g
                # torch's G step runs D in train mode too → third stat update
                return loss_g, (aux, jax.lax.stop_gradient(st3))

            (_, (g_metrics, stats_d_final)), dpred = jax.value_and_grad(
                g_loss_on_pred, has_aux=True)(pred)
            (grads_g,) = g_vjp(dpred.astype(pred.dtype))
            upd_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
            upd_g = jax.tree.map(lambda u: u * state.lr_g, upd_g)
            params_g = jax.tree.map(lambda p, u: p + u, state.params_g, upd_g)

            # train-metric cadence (reference: every 10th batch,
            # pix2pix.py:183).  (step+1) lines up with the trainer's
            # post-increment log cadence; skipped steps carry NaN, which the
            # logger drops (the reference simply doesn't log those keys).
            every = self.train_metrics_every
            if every <= 1:
                train_metrics = calculate_metrics(pred_sg, nir, phase="train")
            else:
                shapes = jax.eval_shape(
                    lambda p, n: calculate_metrics(p, n, phase="train"),
                    pred_sg, nir)
                train_metrics = jax.lax.cond(
                    (state.step + 1) % every == 0,
                    lambda: calculate_metrics(pred_sg, nir, phase="train"),
                    lambda: {k: jnp.full(v.shape, jnp.nan, v.dtype)
                             for k, v in shapes.items()})
            metrics = {**d_metrics, **g_metrics, **train_metrics}
            # learnable conditioning scalars (reference logs them, pix2pix.py:188-192)
            if inject and "scale_param" in params_g:
                metrics["scale_param"] = params_g["scale_param"]
            if inject and "post_correction_param" in params_g:
                metrics["post_correction_param"] = params_g["post_correction_param"]
            metrics = {k: v.astype(jnp.float32) for k, v in metrics.items()}

            new_state = state.replace(step=state.step + 1, params_g=params_g,
                                      params_d=params_d, opt_g=opt_g, opt_d=opt_d,
                                      rng=rng, stats_g=stats_g,
                                      stats_d=stats_d_final)
            return new_state, metrics

        # compiler_options('train') is None — the serve-graph VMEM option
        # measured SLOWER on the fused train step (see runtime.setup)
        copts = default_compiler_options("train")
        if mesh is None:
            return jax.jit(step, donate_argnums=(0,), compiler_options=copts)
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            step,
            in_shardings=(repl, data),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
            compiler_options=copts,
        )

    # ---------------------------------------------------------- eval step
    def make_eval_step(self, mesh=None):
        inject = self.satclip and self.satclip_style == "inject"

        def step(state, batch):
            rgb = self._dn_to_reflectance(batch["rgb"], self.compute_dtype)
            embeds = batch.get("embeds") if inject else None
            pred = self.g_apply(state.params_g, rgb, embeds, train=False,
                                stats=state.stats_g)
            # `_valid` marks real rows of a batch padded up to mesh
            # divisibility (shard_batch(pad_uneven=True)); padded rows drop
            # out of the metric means
            metrics = calculate_metrics(
                pred, self._dn_to_reflectance(batch["nir"], jnp.float32),
                phase="val", mask=batch.get("_valid"))
            return pred.astype(jnp.float32), metrics

        # No pinned shardings: committed inputs carry theirs (state
        # replicated, batch data-sharded by shard_batch), and leaving them
        # free lets uneven val batches (reference val batch 5; any tail
        # batch) run replicated instead of failing mesh divisibility.
        return jax.jit(step, compiler_options=default_compiler_options())

    # ------------------------------------------------------- host-side API
    def extract_batch(self, batch):
        """Reference data contract in, NHWC step-batch out
        (``model/pix2pix.py:426-463``): handles the three SatCLIP routes.

        ``batch``: {"rgb": (B,3,H,W), "nir": (B,1,H,W) [, "coords": (B,2)]}
        (numpy or jnp, NCHW — the universal contract of SURVEY.md §0.1).

        Integer inputs (uint8/uint16 DN) stay integer through the host→device
        transfer — half the ingest bytes on a production host (ROADMAP perf
        bullet; irrelevant through the axon tunnel) — and are scaled DN/10000
        on device by the first op of the jitted step.
        """
        rgb = nchw_to_nhwc(self._ingest(batch["rgb"]))
        nir = nchw_to_nhwc(self._ingest(batch["nir"]))
        if not self.satclip:
            return {"rgb": rgb, "nir": nir}
        coords = np.asarray(batch["coords"], np.float32)
        embeds = self.satclip_model.predict(coords)
        if self.satclip_style == "concat":
            # the embedding plane concatenates as a float 4th channel, so
            # DN ingest converts host-side on this route
            rgb = self._dn_to_reflectance(rgb, np.float32)
            return {"rgb": self._concat_embedding_plane(rgb, embeds), "nir": nir}
        if self.satclip_style == "inject":
            return {"rgb": rgb, "nir": nir, "embeds": jnp.asarray(embeds)}
        raise NotImplementedError("SatClip Style not recognized, choose 'concat' or 'inject'")

    def _ingest(self, x):
        """Host-side dtype policy: uint8/uint16 DN pass through untouched
        (half the host→device bytes); everything else becomes float32."""
        x = np.asarray(x)
        if x.dtype in (np.uint8, np.uint16):
            return x
        if self.transfer_dtype is not None:
            return np.asarray(x, self.transfer_dtype)
        return np.asarray(x, np.float32)

    def _dn_to_reflectance(self, x, dtype):
        """DN → reflectance (x / dn_scale) for integer inputs; floats are
        already reflectance and only change dtype.  Runs on device when
        called inside a jitted step (the intended path), or on host for the
        concat route."""
        if np.issubdtype(np.dtype(x.dtype), np.integer):
            # true division (not * reciprocal): bit-identical to the host
            # loaders' DN/10000, so passthrough and pre-scaled paths agree
            return (x.astype(jnp.float32) / self.dn_scale).astype(dtype)
        return x.astype(dtype)

    def _concat_embedding_plane(self, rgb, embeds):
        """Embedding → image plane → 4th channel (reference
        ``satclip_get_concat``, ``model/pix2pix.py:466-476``): the 256-d
        vector is laid out along width, tiled over height, bicubically
        resized to (W, H) — the reference's swapped-size call — and scaled."""
        b, h, w, _ = rgb.shape
        e = embeds.shape[-1]
        plane = jnp.broadcast_to(jnp.asarray(embeds).reshape(b, 1, e, 1), (b, e, e, 1))
        plane = resize_bicubic(plane, w, h)
        plane = plane * self.satclip_scaling_factor
        return jnp.concatenate([rgb, plane.astype(rgb.dtype)], axis=-1)

    # ------------------------------------------------ int8 serving trunk
    def wants_int8_serving(self) -> bool:
        # norm must be exactly 'instance': the formulation normalises the
        # int32 accumulator through affine-free IN (norm='none' would crash
        # in the generator, norm='batch' has running stats)
        return (self.serving_quant == "int8"
                and getattr(self.netG, "n_blocks", 0) > 0
                and self.opt.get("norm", "instance") == "instance"
                and not self.uses_dropout)

    def build_trunk_q(self, params, x, embeds=None, stage2: bool = False):
        """Quantise the residual trunk for serving (ops/int8_trunk.py).

        ``stage2=True`` additionally quantises the d1 downsample conv
        (``int8_d1_forward``) — implemented, correctness-tested, and
        measured SLOWER in context (1.28× vs the trunk-only 1.37× at b32:
        the quantise+moment overhead outweighs d1's 1.07 ms conv saving,
        benchmarks/RESULTS.md round 4), so it defaults off.

        ``x``: a calibration input exactly as ``g_apply`` would receive it
        (reflectance NHWC float, concat plane already attached on the concat
        route); one instrumented forward calibrates the per-block residual
        stream scales, then weights are quantised per output channel."""
        from nirgan_tpu.ops.int8_trunk import calibrate_trunk, quantize_trunk

        # per-channel absmax saturates with a handful of tiles; slicing keeps
        # the instrumented forward's peak memory bounded at serving batches
        # (b128 would stage 9×2 big trunk activations for the reductions)
        x = x[:16]
        if embeds is not None:
            embeds = embeds[:16]
        xp = reflect_pad2d(x, self.pad_amount) if self.use_padding else x
        inject = self.satclip and self.satclip_style == "inject"
        calib = calibrate_trunk(
            self.netG, params, xp.astype(self.compute_dtype),
            embeds if inject else None, stage2=stage2)
        return quantize_trunk(params, self.netG.n_blocks, calib)

    @functools.lru_cache(maxsize=8)
    def _predict_fn(self, H: int, W: int):
        inject = self.satclip and self.satclip_style == "inject"

        def fn(params_g, stats_g, rgb, embeds, trunk_q):
            pred = self.g_apply(params_g, rgb.astype(self.compute_dtype),
                                embeds if inject else None, train=False,
                                stats=stats_g, trunk_q=trunk_q)
            return pred.astype(jnp.float32)

        graph = "serve_int8" if self.serving_quant == "int8" else "serve"
        return jax.jit(fn, compiler_options=default_compiler_options(graph))

    def bucket_for(self, h: int, w: int) -> int:
        """Smallest static bucket covering (h, w); grows in bucket-sized
        steps beyond the largest configured bucket."""
        m = max(h, w)
        for b in self.shape_buckets:
            if m <= b:
                return b
        top = self.shape_buckets[-1]
        return ((m + top - 1) // top) * top

    def predict_step(self, rgb, coords: Optional[np.ndarray] = None) -> np.ndarray:
        """Public inference API (reference ``predict_step``,
        ``model/pix2pix.py:133-163``): (B,3,H,W) RGB [+ (B,2) coords] →
        (B,1,H,W) NIR.  Arbitrary sizes are padded (reflect) to a static
        bucket for XLA, then cropped back."""
        rgb = np.asarray(rgb, np.float32)
        b, c, h, w = rgb.shape
        batch = {"rgb": rgb, "nir": np.zeros((b, 1, h, w), np.float32)}
        if self.satclip:
            if coords is None:
                raise ValueError("SatCLIP model requires coords (B, 2) for prediction")
            batch["coords"] = coords
        ex = self.extract_batch(batch)
        x = ex["rgb"]
        size = self.bucket_for(h, w)
        if (h, w) != (size, size):
            x = jnp.pad(x, ((0, 0), (0, size - h), (0, size - w), (0, 0)), mode="reflect")
        if self.wants_int8_serving() and self._trunk_q is None:
            # calibrate once, on the first batch served with these params
            self._trunk_q = self.build_trunk_q(self._params_g, x, ex.get("embeds"))
        pred = self._predict_fn(size, size)(
            self._params_g, self._stats_g, x, ex.get("embeds"), self._trunk_q)
        return np.asarray(nhwc_to_nchw(pred[:, :h, :w, :]))

    def bind(self, state_or_params) -> "Px2PxTask":
        """Attach current generator params (and batch stats) for the host
        predict API."""
        self._params_g = getattr(state_or_params, "params_g", state_or_params)
        self._stats_g = getattr(state_or_params, "stats_g", {})
        self._trunk_q = None  # re-calibrated lazily for the new params
        return self

    # ------------------------------------------------------------ weights
    def load_torch_weights(self, path: str):
        """Weights-only warm start from a reference Lightning ckpt
        (``train.py:61-65``, strict=False semantics): returns
        {"params_g": ..., "params_d": ...} with whatever towers the ckpt has."""
        from nirgan_tpu.train.torch_convert import convert_px2px_checkpoint

        return convert_px2px_checkpoint(path, self.config)

    def export_torch_weights(self, path: str, state_or_params=None) -> str:
        """Reverse interop: write a reference-loadable ``.ckpt`` (netG.* /
        netD.* state_dict, ``strict=True``-complete) so models trained here
        serve in the upstream torch stack.  Defaults to the bound params."""
        from nirgan_tpu.train.torch_convert import export_px2px_checkpoint

        src = state_or_params if state_or_params is not None else self._params_g
        params_g = getattr(src, "params_g", src)
        params_d = getattr(src, "params_d", None)
        return export_px2px_checkpoint(params_g, params_d, self.config, path)
