"""Parity of the timm-style pretrained vision towers (SatCLIP
``moco_resnet18`` / ``moco_resnet50`` / ``moco_vit16`` options, reference
``model/satclip/model.py:287-312``).

timm/torchvision are not installed in this image, so the oracle is a literal
torch transcription of the (public, standard) timm ``resnet18``/``resnet50``/
``vit_small_patch16_224`` architectures with random weights and random BN
running statistics; state_dicts use timm key names so
``train/torch_convert.py`` is exercised end-to-end.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from nirgan_tpu.models.satclip.timm_towers import TimmResNet, TimmViT
from nirgan_tpu.train.torch_convert import convert_timm_resnet, convert_timm_vit


# ---------------------------------------------------------------- torch oracle

class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        idt = x if self.downsample is None else self.downsample(x)
        return F.relu(h + idt)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or cin != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out, 1, stride, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        idt = x if self.downsample is None else self.downsample(x)
        return F.relu(h + idt)


class _TorchResNet(nn.Module):
    def __init__(self, block, layers, in_chans=13, num_classes=32):
        super().__init__()
        self.conv1 = nn.Conv2d(in_chans, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for s, (n, planes) in enumerate(zip(layers, (64, 128, 256, 512))):
            blocks = []
            for i in range(n):
                stride = 2 if (s > 0 and i == 0) else 1
                blocks.append(block(cin, planes, stride))
                cin = planes * block.expansion
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(h, 3, 2, 1)
        for s in range(1, 5):
            h = getattr(self, f"layer{s}")(h)
        return self.fc(h.mean(dim=(2, 3)))


class _TorchViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = nn.Linear(dim, dim * 3)
        self.attn_proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_fc1 = nn.Linear(dim, dim * 4)
        self.mlp_fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = self.dim // self.heads
        qkv = self.attn_qkv(self.norm1(x)).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)  # (3, B, heads, N, hd)
        attn = torch.softmax(q @ k.transpose(-2, -1) / hd ** 0.5, dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn_proj(h)
        h = self.mlp_fc2(F.gelu(self.mlp_fc1(self.norm2(x))))
        return x + h


class _TorchViT(nn.Module):
    def __init__(self, in_chans=13, patch=16, dim=96, depth=3, heads=6,
                 num_classes=32, grid=4):
        super().__init__()
        self.patch_embed_proj = nn.Conv2d(in_chans, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(_TorchViTBlock(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        b = x.shape[0]
        h = self.patch_embed_proj(x).flatten(2).transpose(1, 2)
        h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
        h = h + self.pos_embed
        for blk in self.blocks:
            h = blk(h)
        return self.head(self.norm(h[:, 0]))

    def timm_state_dict(self):
        """Rename to timm's key layout."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("patch_embed_proj", "patch_embed.proj")
            k = k.replace("attn_qkv", "attn.qkv").replace("attn_proj", "attn.proj")
            k = k.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
            sd[k] = np.asarray(v.numpy())
        return sd


def _randomize_bn_stats(net, gen):
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


@pytest.mark.parametrize("arch,layers,block,tblock", [
    ("resnet18", (2, 2, 2, 2), "basic", _BasicBlock),
    ("resnet50", (3, 4, 6, 3), "bottleneck", _Bottleneck),
])
def test_timm_resnet_parity(arch, layers, block, tblock):
    gen = torch.Generator().manual_seed(7)
    torch.manual_seed(7)
    net = _TorchResNet(tblock, layers, in_chans=13, num_classes=32).eval()
    _randomize_bn_stats(net, gen)
    sd = {k: np.asarray(v.numpy()) for k, v in net.state_dict().items()}
    params, stats = convert_timm_resnet(sd, layers=layers)

    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 64, 64, 13)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    model = TimmResNet(layers=layers, block=block, num_classes=32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(ref, np.asarray(out), rtol=2e-4, atol=2e-4)


def test_timm_vit_parity():
    torch.manual_seed(9)
    net = _TorchViT(in_chans=13, patch=16, dim=96, depth=3, heads=6,
                    num_classes=32, grid=4).eval()
    params = convert_timm_vit(net.timm_state_dict(), depth=3)

    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 64, 64, 13)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    model = TimmViT(patch_size=16, width=96, depth=3, num_heads=6, num_classes=32)
    out = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(ref, np.asarray(out), rtol=2e-4, atol=2e-4)


def test_timm_vit_pos_embed_resample():
    """convert_timm_vit resamples a 224-grid pos_embed to a different
    input resolution (timm resample_abs_pos_embed behaviour)."""
    torch.manual_seed(11)
    net = _TorchViT(in_chans=13, patch=16, dim=96, depth=1, heads=6,
                    num_classes=8, grid=4)
    params = convert_timm_vit(net.timm_state_dict(), depth=1, num_patches=64)
    assert params["pos_embed"].shape == (1, 65, 96)

    model = TimmViT(patch_size=16, width=96, depth=1, num_heads=6, num_classes=8)
    x = jnp.zeros((1, 128, 128, 13))
    out = model.apply({"params": params}, x, train=False)
    assert out.shape == (1, 8)


def test_satclip_moco_option_builds_and_pretrains():
    """SatCLIP(vision_layers='moco_resnet18') trains with the tower frozen
    except fc (reference requires_grad semantics → optimizer mask)."""
    import jax
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    task = SatClipPretrainTask(embed_dim=16, vision_layers="moco_resnet18",
                               image_resolution=32, in_channels=4,
                               capacity=16, legendre_polys=3)
    assert task.in_channels == 13  # SSL4EO band count wins over the config
    state = task.init_state(seed=0, batch=2)
    step = task.make_train_step()
    rng = np.random.default_rng(3)
    batch = task.extract_batch({
        "image": rng.standard_normal((2, 13, 32, 32)).astype(np.float32),
        "point": rng.uniform(-80, 80, (2, 2)),
    })
    before = jax.device_get(state.params["visual"])
    state2, metrics = step(state, batch)
    after = jax.device_get(state2.params["visual"])
    assert np.isfinite(float(metrics["train_loss"]))

    # frozen: every visual param except fc unchanged; fc moved
    def flat(t, pre=""):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out.update(flat(v, f"{pre}{k}/"))
            else:
                out[f"{pre}{k}"] = np.asarray(v)
        return out

    b, a = flat(before), flat(after)
    for k in b:
        if k.startswith("fc/"):
            assert np.abs(b[k] - a[k]).max() > 0, f"head {k} did not train"
        else:
            np.testing.assert_array_equal(b[k], a[k], err_msg=f"{k} moved while frozen")


def test_load_tower_weights_merges_strict_false(tmp_path):
    """A headless MoCo checkpoint (no fc) merges into the task state; the
    fresh head survives — reference strict=False warm start."""
    import jax
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    torch.manual_seed(12)
    net = _TorchResNet(_BasicBlock, (2, 2, 2, 2), in_chans=13, num_classes=32)
    sd = {k: v for k, v in net.state_dict().items() if not k.startswith("fc.")}
    path = tmp_path / "moco.pth"
    torch.save(sd, str(path))

    task = SatClipPretrainTask(embed_dim=16, vision_layers="moco_resnet18",
                               image_resolution=32, capacity=16,
                               legendre_polys=3)
    state = task.init_state(seed=0, batch=2)
    fc_before = np.asarray(state.params["visual"]["fc"]["kernel"])
    state = task.load_tower_weights(state, str(path))

    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(state.params["visual"]["conv1"]["kernel"]), want, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(state.params["visual"]["fc"]["kernel"]), fc_before)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["visual"]["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy(), rtol=1e-6)


def test_vit_tower_warm_start_resamples_to_task_resolution(tmp_path):
    """SatClipPretrainTask.load_tower_weights for a moco_vit16 checkpoint
    must resample the 224-grid (197-token) pos_embed to the task's
    image_resolution grid — merging it unresampled crashes the first
    forward with a broadcast error."""
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    torch.manual_seed(13)
    # true timm vit_small_patch16_224 geometry: dim 384, depth 12, grid 14
    net = _TorchViT(in_chans=13, patch=16, dim=384, depth=12, heads=6,
                    num_classes=7, grid=14)
    path = str(tmp_path / "ssl4eo_vit.pth")
    # as tensors (load_torch_state_dict keeps tensor-valued entries only)
    torch.save({k: torch.from_numpy(v) for k, v in
                net.timm_state_dict().items()}, path)

    task = SatClipPretrainTask(embed_dim=16, vision_layers="moco_vit16",
                               image_resolution=128, legendre_polys=3)
    state = task.init_state(seed=0)
    state = task.load_tower_weights(state, path)
    grid = (128 // 16) ** 2
    assert state.params["visual"]["pos_embed"].shape == (1, grid + 1, 384)

    rng = np.random.default_rng(3)
    batch = {"image": rng.random((2, 13, 128, 128), np.float32),
             "point": rng.uniform(-80, 80, (2, 2)).astype(np.float32)}
    _, m = task.make_train_step()(state, task.extract_batch(batch))
    assert np.isfinite(float(m["train_loss"]))
