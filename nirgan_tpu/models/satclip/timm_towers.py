"""timm-compatible pretrained vision towers for SatCLIP.

The reference's ``moco_resnet18`` / ``moco_resnet50`` / ``moco_vit16`` vision
options (``/root/reference/model/satclip/model.py:287-312``) build a timm
``resnet18`` / ``resnet50`` / ``vit_small_patch16_224`` with
``in_chans=13`` (SSL4EO Sentinel-2 all-band weights from torchgeo), load the
MoCo state_dict with ``strict=False``, freeze everything, and re-enable
gradients only on the classification head (``fc`` / ``head``).

These flax modules reproduce those exact architectures (timm's ResNet is the
torchvision layout; the ViT is the standard pre-norm ViT-S/16) with
parameter names chosen so ``train/torch_convert.py`` can map a
timm/torchgeo state_dict mechanically.  Freezing is an optimizer concern —
see ``tasks/satclip_pretrain.py`` (``frozen_tower_labels``), mirroring the
reference's ``requires_grad_(False)`` + head re-enable.

NHWC, statistics in float32; BatchNorm running stats live in the
``batch_stats`` collection like the other towers.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["TimmResNet", "TimmViT", "build_pretrained_tower",
           "PRETRAINED_TOWERS"]


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


class BasicBlock(nn.Module):
    """torchvision/timm ResNet BasicBlock (3×3 + 3×3, expansion 1)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1", train)(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = _bn("bn2", train)(h)
        identity = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(h + identity)


class TimmBottleneck(nn.Module):
    """torchvision/timm ResNet Bottleneck (1×1 → 3×3 stride → 1×1, exp 4).

    Distinct from the CLIP ``Bottleneck`` in ``model.py`` (which strides via
    an avg-pool): here the stride lives on conv2, torchvision-style."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1", train)(h))
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.relu(_bn("bn2", train)(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = _bn("bn3", train)(h)
        identity = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(h + identity)


class TimmResNet(nn.Module):
    """timm ``resnet18`` (BasicBlock, [2,2,2,2]) / ``resnet50``
    (Bottleneck, [3,4,6,3]) with ``num_classes`` head and arbitrary
    ``in_chans`` — 7×7/s2 stem, 3×3/s2 max-pool, four stages, global average
    pool, ``fc``."""

    layers: Sequence[int]
    block: str = "basic"  # 'basic' | 'bottleneck'
    num_classes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        h = nn.relu(_bn("bn1", train)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        blk = BasicBlock if self.block == "basic" else TimmBottleneck
        for stage, (n, planes) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                h = blk(planes, stride=stride,
                        name=f"layer{stage + 1}_{i}")(h, train)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes, name="fc")(h)


class ViTBlock(nn.Module):
    """Standard pre-norm transformer block (timm ``vit_small_patch16_224``):
    LN → MHSA (qkv bias) → residual; LN → MLP(4×, exact GELU) → residual."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.num_heads

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(x.dtype)
        qkv = nn.Dense(3 * self.dim, name="attn_qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, N, heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        h = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, self.dim)
        x = x + nn.Dense(self.dim, name="attn_proj")(h)

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(self.dim * 4, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="mlp_fc2")(h)


class TimmViT(nn.Module):
    """timm ``vit_small_patch16_224``: patch 16, width 384, 12 blocks,
    6 heads, cls-token pooling, learned absolute position embedding."""

    patch_size: int = 16
    width: int = 384
    depth: int = 12
    num_heads: int = 6
    num_classes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # inference-mode dropout (0.0) throughout
        b = x.shape[0]
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID",
                    name="patch_embed_proj")(x)
        h = h.reshape(b, -1, self.width)
        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, self.width))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(h.dtype), h], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h.shape[1], self.width))
        h = h + pos.astype(h.dtype)
        for i in range(self.depth):
            h = ViTBlock(self.width, self.num_heads, name=f"blocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            h[:, 0].astype(jnp.float32)).astype(h.dtype)
        return nn.Dense(self.num_classes, name="head")(h)


#: reference option name → (builder kwargs, head param name)
PRETRAINED_TOWERS = {
    "moco_resnet18": (dict(layers=(2, 2, 2, 2), block="basic"), "fc"),
    "moco_resnet50": (dict(layers=(3, 4, 6, 3), block="bottleneck"), "fc"),
    "moco_vit16": (dict(), "head"),
}


def build_pretrained_tower(name: str, embed_dim: int) -> nn.Module:
    """Reference ``model.py:287-312``: the SSL4EO weights dictate 13 input
    channels; only ``num_classes`` (the new head) follows ``embed_dim``."""
    kwargs, _ = PRETRAINED_TOWERS[name]
    if name == "moco_vit16":
        return TimmViT(num_classes=embed_dim)
    return TimmResNet(num_classes=embed_dim, **kwargs)
