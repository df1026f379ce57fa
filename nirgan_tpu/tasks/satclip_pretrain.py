"""SatCLIP pretraining task (reference ``SatCLIPLightningModule``,
``model/satclip/main.py:13-106``): contrastive training of the dual encoder
with AdamW and the CLIP weight-decay exclusion (no decay for params with
ndim < 2, bn/ln params, biases, and the logit scale — ``main.py:77-94``).

The frozen positional encoding runs host-side in float64; the trainable
towers run under one jitted step (batch-stats of the ResNet tower are
carried as a mutable collection).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp
import optax

from nirgan_tpu.models.satclip.model import SatCLIP, satclip_loss
from nirgan_tpu.models.satclip.timm_towers import PRETRAINED_TOWERS
from nirgan_tpu.models.satclip.positional_encoding import get_positional_encoding
from nirgan_tpu.parallel import batch_sharding, replicated_sharding
from nirgan_tpu.runtime.setup import default_compiler_options

__all__ = ["SatClipPretrainTask", "SatClipTrainState"]


@flax.struct.dataclass
class SatClipTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt: Any
    rng: Any


def _decay_mask(params):
    """True → weight decay applies (reference exclusion rule inverted)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        joined = "/".join(str(n) for n in names).lower()
        if leaf.ndim < 2 or "bn" in joined or "ln" in joined or "logit_scale" in joined:
            return False
        if names and str(names[-1]) == "bias":
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def _frozen_tower_mask(head_name: str):
    """True → parameter is frozen.  Mirrors the reference's
    ``visual.requires_grad_(False)`` + head re-enable
    (``model/satclip/model.py:291-312``): everything under ``visual/`` except
    ``visual/<head_name>/``."""

    def mask(params):
        def decide(path, leaf):
            names = [str(getattr(p, "key", "")) for p in path]
            return bool(names and names[0] == "visual"
                        and (len(names) < 2 or names[1] != head_name))

        return jax.tree_util.tree_map_with_path(decide, params)

    return mask


class SatClipPretrainTask:
    def __init__(self, embed_dim: int = 256, le_type: str = "sphericalharmonics",
                 pe_type: str = "siren", legendre_polys: int = 10,
                 harmonics_calculation: str = "analytic", frequency_num: int = 16,
                 min_radius: float = 1, max_radius: float = 360,
                 vision_layers=(3, 4, 6, 3), vision_width: int = 64,
                 vision_patch_size: int = 32, image_resolution: int = 256,
                 in_channels: int = 4, capacity: int = 256,
                 num_hidden_layers: int = 2, learning_rate: float = 1e-4,
                 weight_decay: float = 0.01,
                 accumulate_grad_batches: int = 1):
        self.pretrained_head = None
        if isinstance(vision_layers, str) and vision_layers in PRETRAINED_TOWERS:
            # SSL4EO MoCo weights are 13-band Sentinel-2; the reference takes
            # in_chans from weights.meta and ignores the config value
            in_channels = 13
            self.pretrained_head = PRETRAINED_TOWERS[vision_layers][1]
        self.posenc = get_positional_encoding(
            le_type, legendre_polys=legendre_polys,
            harmonics_calculation=harmonics_calculation,
            min_radius=min_radius, max_radius=max_radius,
            frequency_num=frequency_num)
        self.model = SatCLIP(embed_dim=embed_dim, vision_layers=vision_layers,
                             vision_width=vision_width,
                             vision_patch_size=vision_patch_size,
                             image_resolution=image_resolution,
                             in_channels=in_channels, pe_type=pe_type,
                             capacity=capacity,
                             num_hidden_layers=num_hidden_layers)
        self.image_resolution = image_resolution
        self.in_channels = in_channels
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        # reference trainer default: accumulate_grad_batches=16
        # (main.py:131) — one optimizer update per K micro-batches
        self.accumulate_grad_batches = int(accumulate_grad_batches)
        self._tx = None

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int = 0, batch: int = 2) -> SatClipTrainState:
        k = jax.random.key(seed)
        ki, kr = jax.random.split(k)
        img = jnp.zeros((batch, self.image_resolution, self.image_resolution,
                         self.in_channels))
        feats = jnp.zeros((batch, self.posenc.embedding_dim))
        variables = self.model.init({"params": ki, "dropout": ki}, img, feats,
                                    train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self._tx = optax.adamw(self.learning_rate, weight_decay=self.weight_decay,
                               mask=_decay_mask(params))
        if self.pretrained_head is not None:
            # frozen-except-head: zero the updates of the pretrained tower
            self._tx = optax.chain(
                self._tx,
                optax.masked(optax.set_to_zero(),
                             _frozen_tower_mask(self.pretrained_head)))
        if self.accumulate_grad_batches > 1:
            self._tx = optax.MultiSteps(self._tx,
                                        self.accumulate_grad_batches)
        return SatClipTrainState(step=jnp.zeros((), jnp.int32), params=params,
                                 batch_stats=batch_stats,
                                 opt=self._tx.init(params), rng=kr)

    # --------------------------------------------------------------- weights
    def load_tower_weights(self, state: "SatClipTrainState", path: str):
        """Warm-start a ``moco_*`` vision tower from a timm/torchgeo SSL4EO
        state_dict (reference ``load_state_dict(..., strict=False)``,
        ``model/satclip/model.py:292``): present keys with matching shapes
        are merged; the fresh head stays (MoCo checkpoints carry no
        classifier, and a supervised checkpoint's classifier has the wrong
        width — shape-mismatched leaves are skipped, merge_params
        semantics)."""
        from nirgan_tpu.train.torch_convert import (
            convert_timm_resnet,
            convert_timm_vit,
            load_torch_state_dict,
        )

        if self.pretrained_head is None:
            raise ValueError("tower weights only apply to moco_* vision options")
        sd = load_torch_state_dict(path)
        if self.pretrained_head == "head":  # ViT (patch 16): resample the
            # checkpoint's 224-grid pos_embed to this model's grid
            n_patches = (self.image_resolution // 16) ** 2
            params, stats = convert_timm_vit(sd, num_patches=n_patches), {}
        else:
            layers = (2, 2, 2, 2) if "resnet18" in str(self.model.vision_layers) \
                else (3, 4, 6, 3)
            params, stats = convert_timm_resnet(sd, layers=layers)

        from nirgan_tpu.train.checkpoint import merge_params

        new_params = dict(state.params)
        new_params["visual"] = merge_params(
            jax.device_get(state.params["visual"]), params)
        new_stats = state.batch_stats
        if stats:
            new_stats = dict(state.batch_stats)
            new_stats["visual"] = merge_params(
                jax.device_get(state.batch_stats.get("visual", {})), stats)
        return state.replace(
            params=jax.tree.map(jnp.asarray, new_params),
            batch_stats=jax.tree.map(jnp.asarray, new_stats))

    # ----------------------------------------------------------------- batch
    def extract_batch(self, batch):
        """{"image": (B,C,H,W), "point": (B,2)} → NHWC image + f32 posenc
        features (posenc computed in float64 on host, reference
        ``model.py:329-331``)."""
        img = np.transpose(np.asarray(batch["image"], np.float32), (0, 2, 3, 1))
        pts = np.asarray(batch["point"], np.float64)
        feats = np.asarray(self.posenc(pts), np.float32)
        return {"image": jnp.asarray(img), "loc_features": jnp.asarray(feats)}

    # ------------------------------------------------------------------ step
    def make_train_step(self, mesh=None):
        tx = self._tx

        def step(state: SatClipTrainState, batch):
            rng, dkey = jax.random.split(state.rng)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out, mutated = self.model.apply(
                    variables, batch["image"], batch["loc_features"], train=True,
                    mutable=["batch_stats"] if state.batch_stats else [],
                    rngs={"dropout": dkey})
                loss = satclip_loss(*out)
                return loss, mutated

            (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            upd, opt = tx.update(grads, state.opt, state.params)
            params = optax.apply_updates(state.params, upd)
            new_stats = mutated.get("batch_stats", state.batch_stats)
            return (state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt=opt, rng=rng),
                    {"train_loss": loss.astype(jnp.float32)})

        copts = default_compiler_options("train")
        if mesh is None:
            return jax.jit(step, donate_argnums=(0,), compiler_options=copts)
        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, data), out_shardings=(repl, repl),
                       donate_argnums=(0,), compiler_options=copts)

    def make_eval_step(self):
        def step(state: SatClipTrainState, batch):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = self.model.apply(variables, batch["image"],
                                   batch["loc_features"], train=False)
            return {"val_loss": satclip_loss(*out).astype(jnp.float32)}

        return jax.jit(step, compiler_options=default_compiler_options())

    # ------------------------------------------------------------- location
    def location_encoder(self, state: SatClipTrainState):
        """The frozen-deployment view: (lon, lat) → embedding, using current
        weights (what ``get_satclip`` returns, reference ``load.py:12-17``)."""
        params = jax.device_get(state.params)

        def encode(coords):
            feats = np.asarray(self.posenc(np.asarray(coords, np.float64)),
                               np.float32)
            return self.model.apply({"params": params}, jnp.asarray(feats),
                                    method=lambda m, f: m.nnet(f, False))

        return encode
