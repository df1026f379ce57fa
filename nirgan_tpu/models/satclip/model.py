"""Full SatCLIP model (reference ``model/satclip/model.py``): CLIP-style
dual encoder over (satellite image, location), with a ModifiedResNet or
VisionTransformer vision tower and a positional-encoding + neural-net
location tower, joined by a temperature-scaled cosine-similarity logit
matrix and a symmetric cross-entropy loss (``model/satclip/loss.py:37-47``).

Only the location branch runs inside NIR-GAN (``load.py:12-17``); the full
model is here so SatCLIP itself can be (re)trained TPU-natively.

Design notes:
  * NHWC + bf16-friendly; LayerNorms compute in f32 (CLIP's fp16 guard,
    reference ``LayerNorm``/``model.py:168-173``).
  * The frozen positional encoding runs host-side in float64 (reference
    casts the whole location tower to ``.double()``, ``model.py:329-331``);
    ``SatCLIP.__call__`` therefore takes pre-encoded location *features*.
  * The reference's MLP builder repeats one hidden-layer module object
    ``num_layers`` times (``location_encoder.py:58``) — accidental weight
    sharing; we instantiate distinct layers and note the difference.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple, Union

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from nirgan_tpu.models.satclip.timm_towers import (
    PRETRAINED_TOWERS,
    build_pretrained_tower,
)

__all__ = ["SatCLIP", "satclip_loss", "ModifiedResNet", "VisionTransformer",
           "AttentionPool2d", "SirenNet", "LocMLP", "FCNet", "get_neural_network"]


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPLayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32)).astype(x.dtype)


# --------------------------------------------------------------------------
# ModifiedResNet vision tower
# --------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """CLIP bottleneck: stride lives in an avg-pool after conv2; the
    downsample branch is avgpool → 1×1 conv (anti-aliased striding)."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        out_ch = self.planes * self.expansion
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride, self.stride), (self.stride, self.stride))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = bn("bn3")(h)

        identity = x
        if self.stride > 1 or inplanes != out_ch:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       (self.stride, self.stride))
            identity = nn.Conv(out_ch, (1, 1), use_bias=False, name="down_conv")(identity)
            identity = bn("down_bn")(identity)
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool: a mean token queries all spatial tokens
    (reference ``model.py:65-98``)."""

    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        tok = x.reshape(b, h * w, c)
        tok = jnp.concatenate([tok.mean(axis=1, keepdims=True), tok], axis=1)
        pos = self.param("positional_embedding",
                         lambda k, s: jax.random.normal(k, s) / (self.embed_dim ** 0.5),
                         (h * w + 1, self.embed_dim))
        tok = tok + pos[None].astype(tok.dtype)

        std = self.embed_dim ** -0.5
        init = nn.initializers.normal(std)
        q = nn.Dense(self.embed_dim, kernel_init=init, name="q_proj")(tok[:, :1])
        k = nn.Dense(self.embed_dim, kernel_init=init, name="k_proj")(tok)
        v = nn.Dense(self.embed_dim, kernel_init=init, name="v_proj")(tok)
        hd = self.embed_dim // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        pooled = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, 1, self.embed_dim)
        out = nn.Dense(self.output_dim, kernel_init=init, name="c_proj")(pooled)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP's ResNet: 3-conv stem + avgpool, anti-aliased strides, attention
    pool head (reference ``model.py:101-166``)."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        w = self.width
        h = nn.Conv(w // 2, (3, 3), strides=2, padding=1, use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(w // 2, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(w, (3, 3), padding=1, use_bias=False, name="conv3")(h)
        h = nn.relu(bn("bn3")(h))
        h = nn.avg_pool(h, (2, 2), (2, 2))

        for stage, (n_blocks, mult, stride) in enumerate(
                zip(self.layers, (1, 2, 4, 8), (1, 2, 2, 2))):
            for i in range(n_blocks):
                h = Bottleneck(w * mult, stride=stride if i == 0 else 1,
                               name=f"layer{stage + 1}_{i}")(h, train)
        return AttentionPool2d(w * 32, self.heads, self.output_dim,
                               name="attnpool")(h)


# --------------------------------------------------------------------------
# VisionTransformer tower
# --------------------------------------------------------------------------

class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, x):
        h = CLIPLayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=self.d_model, name="attn")(h, h)
        x = x + h
        h = CLIPLayerNorm(name="ln_2")(x)
        h = nn.Dense(self.d_model * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.d_model, name="c_proj")(h)
        return x + h


class VisionTransformer(nn.Module):
    """CLIP ViT (reference ``model.py:213-247``)."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    in_channels: int
    output_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no batch stats / dropout in the CLIP ViT
        b = x.shape[0]
        scale = self.width ** -0.5
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, use_bias=False, padding="VALID",
                    name="conv1")(x)
        h = h.reshape(b, -1, self.width)
        cls = self.param("class_embedding",
                         lambda k, s: scale * jax.random.normal(k, s), (self.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, self.width)).astype(h.dtype), h],
            axis=1)
        pos = self.param("positional_embedding",
                         lambda k, s: scale * jax.random.normal(k, s),
                         (h.shape[1], self.width))
        h = h + pos[None].astype(h.dtype)
        h = CLIPLayerNorm(name="ln_pre")(h)
        for i in range(self.layers):
            h = ResidualAttentionBlock(self.width, self.heads, name=f"block{i}")(h)
        h = CLIPLayerNorm(name="ln_post")(h[:, 0])
        proj = self.param("proj", lambda k, s: scale * jax.random.normal(k, s),
                          (self.width, self.output_dim))
        return h @ proj.astype(h.dtype)


# --------------------------------------------------------------------------
# trainable location networks (reference location_encoder.py:13-151)
# --------------------------------------------------------------------------

def _siren_init(is_first: bool, w0: float, c: float = 6.0):
    def init(key, shape, dtype=jnp.float32):
        dim_in = shape[0]
        s = (1.0 / dim_in) if is_first else (math.sqrt(c / dim_in) / w0)
        return jax.random.uniform(key, shape, dtype, -s, s)

    return init


class SirenNet(nn.Module):
    dim_hidden: int = 256
    dim_out: int = 256
    num_layers: int = 2
    w0: float = 1.0
    w0_initial: float = 30.0
    dropout: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            w0 = self.w0_initial if i == 0 else self.w0
            x = nn.Dense(self.dim_hidden, kernel_init=_siren_init(i == 0, w0),
                         bias_init=_siren_init(i == 0, w0), name=f"layers_{i}")(x)
            if self.dropout:
                x = nn.Dropout(0.5, deterministic=not train)(x)
            x = jnp.sin(w0 * x)
        return nn.Dense(self.dim_out, kernel_init=_siren_init(False, self.w0),
                        bias_init=_siren_init(False, self.w0), name="last_layer")(x)


class LocMLP(nn.Module):
    """Reference MLP (distinct hidden layers — upstream accidentally shares
    one module across its repeats, see module docstring)."""

    dim_hidden: int = 256
    dim_out: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Dense(self.dim_hidden)(x))
        for _ in range(self.num_layers):
            x = nn.relu(nn.Dense(self.dim_hidden)(x))
        return nn.Dense(self.dim_out)(x)


class FCNet(nn.Module):
    dim_hidden: int = 256
    dim_out: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Dense(self.dim_hidden)(x))
        for i in range(4):
            y = nn.relu(nn.Dense(self.dim_hidden, name=f"res{i}_w1")(x))
            y = nn.Dropout(0.5, deterministic=not train)(y)
            y = nn.relu(nn.Dense(self.dim_hidden, name=f"res{i}_w2")(y))
            x = x + y
        return nn.Dense(self.dim_out, use_bias=False, name="class_emb")(x)


def get_neural_network(name: str, num_classes: int = 256, dim_hidden: int = 256,
                       num_layers: int = 2):
    """Dispatch (reference ``location_encoder.py:241-265``); 'linear' is a
    1-layer Dense."""
    if name == "linear":
        return nn.Dense(num_classes)
    if name == "mlp":
        return LocMLP(dim_hidden=dim_hidden, dim_out=num_classes,
                      num_layers=num_layers)
    if name == "siren":
        return SirenNet(dim_hidden=dim_hidden, dim_out=num_classes,
                        num_layers=num_layers)
    if name == "fcnet":
        return FCNet(dim_hidden=dim_hidden, dim_out=num_classes)
    raise ValueError(f"{name} not a known neural networks.")


# --------------------------------------------------------------------------
# SatCLIP
# --------------------------------------------------------------------------

class SatCLIP(nn.Module):
    embed_dim: int = 256
    # vision
    vision_layers: Union[Tuple[int, int, int, int], int] = (3, 4, 6, 3)
    vision_width: int = 64
    vision_patch_size: int = 32
    image_resolution: int = 256
    in_channels: int = 4
    # location net
    pe_type: str = "siren"
    capacity: int = 256
    num_hidden_layers: int = 2

    def setup(self):
        if isinstance(self.vision_layers, (tuple, list)):
            heads = max(1, self.vision_width * 32 // 64)
            self.visual = ModifiedResNet(layers=self.vision_layers,
                                         output_dim=self.embed_dim, heads=heads,
                                         input_resolution=self.image_resolution,
                                         width=self.vision_width,
                                         in_channels=self.in_channels)
        elif isinstance(self.vision_layers, str) and self.vision_layers in PRETRAINED_TOWERS:
            # reference model.py:287-312: timm tower built for the SSL4EO
            # MoCo weights (13-channel Sentinel-2), frozen except the head
            # (freezing handled by the pretrain task's optimizer labels)
            self.visual = build_pretrained_tower(self.vision_layers,
                                                 self.embed_dim)
        else:
            heads = max(1, self.vision_width // 64)
            self.visual = VisionTransformer(
                input_resolution=self.image_resolution,
                patch_size=self.vision_patch_size, width=self.vision_width,
                layers=self.vision_layers, heads=heads,
                in_channels=self.in_channels, output_dim=self.embed_dim)
        self.nnet = get_neural_network(self.pe_type, num_classes=self.embed_dim,
                                       dim_hidden=self.capacity,
                                       num_layers=self.num_hidden_layers)
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, math.log(1.0 / 0.07)), ())

    def encode_image(self, image, train: bool = False):
        return self.visual(image, train)

    def encode_location(self, loc_features, train: bool = False):
        return self.nnet(loc_features, train)

    def __call__(self, image, loc_features, train: bool = False):
        """image (B,H,W,C) NHWC; loc_features = posenc(lon,lat) computed
        host-side (float64 → float32).  Returns (logits_per_image,
        logits_per_location)."""
        img = self.encode_image(image, train).astype(jnp.float32)
        loc = self.encode_location(loc_features.astype(image.dtype),
                                   train).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=1, keepdims=True)
        loc = loc / jnp.linalg.norm(loc, axis=1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ loc.T
        return logits_per_image, logits_per_image.T


def satclip_loss(logits_per_image, logits_per_coord):
    """Symmetric InfoNCE (reference ``loss.py:37-47``)."""
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)

    def ce(logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(logp[jnp.arange(n), labels])

    return (ce(logits_per_image) + ce(logits_per_coord)) / 2.0
