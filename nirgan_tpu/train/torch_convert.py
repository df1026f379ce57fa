"""torch → JAX checkpoint conversion.

The reference publishes Lightning checkpoints (HF hub, ``README.md:104``)
whose ``state_dict`` keys follow the torch ``nn.Sequential`` index layout of
``model/networks.py`` (e.g. ``netG.model.10.conv_block.1.weight``).  This
module maps those onto the named flax trees produced by
``nirgan_tpu.models`` so published weights can be loaded for parity testing
and warm starts (reference ``train.py:61-65`` semantics: partial,
``strict=False``).

Weight layout transforms:
    conv          OIHW → HWIO   (transpose 2,3,1,0)
    conv-transp.  IOHW → HWIO   (transpose 2,3,0,1)
    linear        (out,in) → (in,out)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "clean_checkpoint",
    "convert_resnet_generator",
    "convert_nlayer_discriminator",
    "convert_pixel_discriminator",
    "convert_px2px_checkpoint",
    "convert_baseline",
    "convert_timm_resnet",
    "convert_timm_vit",
    "export_resnet_generator",
    "export_unet_generator",
    "export_nlayer_discriminator",
    "export_pixel_discriminator",
    "export_px2px_checkpoint",
]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch/Lightning ckpt into a flat {key: np.ndarray} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()
            if hasattr(v, "detach")}


def clean_checkpoint(checkpoint_path: str, unexpected_keys=()) -> str:
    """Strip unexpected keys from a torch checkpoint in place (reference
    ``Px2Px_PL.clean_checkpoint``, ``model/pix2pix.py:118-130``).  Rarely
    needed here — ``merge_params`` already gives strict=False semantics —
    but kept for checkpoint-file hygiene parity."""
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    for k in unexpected_keys:
        if k in ckpt.get("state_dict", {}):
            del ckpt["state_dict"][k]
    torch.save(ckpt, checkpoint_path)
    print("Removed unexpected keys from checkpoint: ", list(unexpected_keys))
    return checkpoint_path


def _conv(sd: Mapping[str, np.ndarray], key: str) -> dict:
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _convT(sd: Mapping[str, np.ndarray], key: str) -> dict:
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 0, 1))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _dense(sd: Mapping[str, np.ndarray], key: str) -> dict:
    out = {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def convert_resnet_generator(
    sd: Mapping[str, np.ndarray],
    prefix: str = "",
    n_blocks: int = 9,
    use_dropout: bool = False,
) -> dict:
    """Map a torch ``ResnetGenerator``/``ResnetGenerator_inject`` state_dict
    (Sequential layout at ``model/networks.py:341-370``) to flax params.

    Torch index plan (instance norm ⇒ parameter-free norm layers):
      1 stem conv7 · 4,7 downsample convs · 10..10+n-1 resnet blocks
      (convs at conv_block.1 and conv_block.{5|6 with dropout}) ·
      19,22 up conv-transposes · 26 head conv7 (indices shift by n_blocks-9).
    """
    p = prefix
    blk0 = 10
    up0 = blk0 + n_blocks
    conv2_idx = 6 if use_dropout else 5
    params = {
        "c0": _conv(sd, f"{p}model.1"),
        "d0": _conv(sd, f"{p}model.4"),
        "d1": _conv(sd, f"{p}model.7"),
        "u0": _convT(sd, f"{p}model.{up0}"),
        "u1": _convT(sd, f"{p}model.{up0 + 3}"),
        "c1": _conv(sd, f"{p}model.{up0 + 7}"),
    }
    for i in range(n_blocks):
        params[f"r{i}"] = {
            "conv1": _conv(sd, f"{p}model.{blk0 + i}.conv_block.1"),
            "conv2": _conv(sd, f"{p}model.{blk0 + i}.conv_block.{conv2_idx}"),
        }
    # injection-variant extras (model/generator_inject.py:88-100)
    if f"{p}fc.weight" in sd:
        params["fc"] = _dense(sd, f"{p}fc")
    if f"{p}scale_param" in sd:
        params["scale_param"] = sd[f"{p}scale_param"]
    if f"{p}post_correction_param" in sd:
        params["post_correction_param"] = sd[f"{p}post_correction_param"]
    return params


def convert_nlayer_discriminator(
    sd: Mapping[str, np.ndarray], prefix: str = "", n_layers: int = 3
) -> dict:
    """Map a torch ``NLayerDiscriminator`` state_dict
    (``model/networks.py:557-580``)."""
    p = prefix
    params = {"conv0": _conv(sd, f"{p}model.0")}
    for n in range(1, n_layers + 1):
        params[f"conv{n}"] = _conv(sd, f"{p}model.{2 + 3 * (n - 1)}")
    params[f"conv{n_layers + 1}"] = _conv(sd, f"{p}model.{2 + 3 * n_layers}")
    return params


def convert_pixel_discriminator(sd: Mapping[str, np.ndarray], prefix: str = "") -> dict:
    """Map a torch ``PixelDiscriminator`` state_dict (``model/networks.py:604-612``)."""
    p = prefix
    return {
        "conv0": _conv(sd, f"{p}net.0"),
        "conv1": _conv(sd, f"{p}net.2"),
        "conv2": _conv(sd, f"{p}net.5"),
    }


def convert_px2px_checkpoint(path_or_sd, config) -> dict:
    """Convert a full ``Px2Px_PL`` Lightning ckpt (netG.* + netD.* keys) into
    ``{"params_g": ..., "params_d": ...}`` given the experiment config.

    Mirrors the reference's weights-only warm start (``train.py:61-65``);
    missing towers are simply absent from the result (strict=False).
    """
    sd = load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    bc = config.base_configs
    out = {}
    if any(k.startswith("netG.") for k in sd):
        if bc.netG.startswith("unet"):
            out["params_g"] = convert_unet_generator(
                sd, prefix="netG.",
                num_downs=7 if bc.netG == "unet_128" else 8)
        else:
            out["params_g"] = convert_resnet_generator(
                sd,
                prefix="netG.",
                n_blocks=9 if bc.netG == "resnet_9blocks" else 6,
                use_dropout=not bc.no_dropout,
            )
    if any(k.startswith("netD.") for k in sd):
        if bc.netD == "pixel":
            out["params_d"] = convert_pixel_discriminator(sd, prefix="netD.")
        else:
            out["params_d"] = convert_nlayer_discriminator(
                sd, prefix="netD.", n_layers=3 if bc.netD == "basic" else bc.n_layers_D
            )
    return out


def _linear_as_conv1x1(sd: Mapping[str, np.ndarray], key: str) -> dict:
    """torch ``nn.Linear`` (out,in) → 1×1 conv kernel (1,1,in,out) — the
    per-pixel baselines express Linear layers as 1×1 convs
    (``models/baselines.py``)."""
    w = sd[f"{key}.weight"]
    out = {"kernel": np.transpose(w, (1, 0))[None, None]}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def convert_baseline(sd: Mapping[str, np.ndarray], model_name: str) -> dict:
    """Map a reference baseline state_dict (``model/baseline_models.py``:
    ``Linear_NIR.linear`` / ``MLP_NIR.mlp.{0,2,4}`` / ``CNN_NIR.net.{0,2,4}``)
    onto the flax baseline params — closes the reference's shared
    weights-only warm-start mechanism (``train.py:61-65``) for baselines."""
    if model_name == "Linear_NIR":
        return {"linear": _linear_as_conv1x1(sd, "linear")}
    if model_name == "MLP_NIR":
        return {f"fc{i}": _linear_as_conv1x1(sd, f"mlp.{2 * i}") for i in range(3)}
    if model_name == "CNN_NIR":
        return {f"conv{i}": _conv(sd, f"net.{2 * i}") for i in range(3)}
    raise ValueError("Invalid Model Name")


def _bn_split(sd: Mapping[str, np.ndarray], key: str):
    """torch BatchNorm → (flax params, flax batch_stats)."""
    return (
        {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]},
        {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]},
    )


def _ln(sd: Mapping[str, np.ndarray], key: str) -> dict:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def convert_timm_resnet(sd: Mapping[str, np.ndarray], prefix: str = "",
                        layers=(2, 2, 2, 2)):
    """Map a timm/torchvision ``resnet18``/``resnet50`` state_dict (the
    SSL4EO-MoCo weight layout the reference loads at
    ``model/satclip/model.py:287-303``) onto
    ``models/satclip/timm_towers.TimmResNet``.

    Returns ``(params, batch_stats)``; a missing head (``strict=False`` in
    the reference — MoCo checkpoints carry no fc) leaves ``fc`` absent.
    """
    p = prefix
    params: dict = {"conv1": _conv(sd, f"{p}conv1")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn_split(sd, f"{p}bn1")
    for stage, n in enumerate(layers):
        for i in range(n):
            tk = f"{p}layer{stage + 1}.{i}"
            name = f"layer{stage + 1}_{i}"
            bp: dict = {}
            bs: dict = {}
            for c in ("conv1", "conv2", "conv3"):
                if f"{tk}.{c}.weight" in sd:
                    bp[c] = _conv(sd, f"{tk}.{c}")
                    bn = c.replace("conv", "bn")
                    bp[bn], bs[bn] = _bn_split(sd, f"{tk}.{bn}")
            if f"{tk}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{tk}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn_split(
                    sd, f"{tk}.downsample.1")
            params[name] = bp
            stats[name] = bs
    if f"{p}fc.weight" in sd:
        params["fc"] = _dense(sd, f"{p}fc")
    return params, stats


def convert_timm_vit(sd: Mapping[str, np.ndarray], prefix: str = "",
                     depth: int = 12, num_patches: int = None) -> dict:
    """Map a timm ``vit_small_patch16_224`` state_dict onto
    ``models/satclip/timm_towers.TimmViT`` (reference
    ``model/satclip/model.py:305-312``).

    ``num_patches``: target grid size (e.g. 256 for 256² inputs at patch 16);
    when it differs from the checkpoint's, the grid part of ``pos_embed`` is
    bilinearly resampled (timm's ``resample_abs_pos_embed`` behaviour).
    """
    p = prefix
    params: dict = {
        "patch_embed_proj": _conv(sd, f"{p}patch_embed.proj"),
        "cls_token": sd[f"{p}cls_token"],
        "pos_embed": sd[f"{p}pos_embed"],
    }
    if num_patches is not None and num_patches != params["pos_embed"].shape[1] - 1:
        import jax

        pe = params["pos_embed"]
        cls_pe, grid_pe = pe[:, :1], pe[:, 1:]
        old = int(round(grid_pe.shape[1] ** 0.5))
        new = int(round(num_patches ** 0.5))
        grid = grid_pe.reshape(1, old, old, -1)
        grid = np.asarray(jax.image.resize(grid, (1, new, new, grid.shape[-1]),
                                           method="bilinear"))
        params["pos_embed"] = np.concatenate(
            [cls_pe, grid.reshape(1, new * new, -1)], axis=1)
    for i in range(depth):
        bk = f"{p}blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{bk}.norm1"),
            "attn_qkv": _dense(sd, f"{bk}.attn.qkv"),
            "attn_proj": _dense(sd, f"{bk}.attn.proj"),
            "norm2": _ln(sd, f"{bk}.norm2"),
            "mlp_fc1": _dense(sd, f"{bk}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{bk}.mlp.fc2"),
        }
    params["norm"] = _ln(sd, f"{p}norm")
    if f"{p}head.weight" in sd:
        params["head"] = _dense(sd, f"{p}head")
    return params


def convert_unet_generator(sd: Mapping[str, np.ndarray], prefix: str = "",
                           num_downs: int = 8) -> dict:
    """Map a torch ``UnetGenerator`` state_dict onto the flax tree.

    Torch nests ``UnetSkipConnectionBlock``s recursively; each block's
    Sequential indices depend on its role (``model/networks.py:504-530``):
      outermost: [downconv(0), sub(1), uprelu, upconv(3), tanh]
      middle:    [downrelu, downconv(1), downnorm, sub(3), uprelu, upconv(5),
                  upnorm]  (instance norm ⇒ norm layers parameter-free)
      innermost: [downrelu, downconv(1), uprelu, upconv(3), upnorm]
    Our flax tree nests as {"unet": {"down", "up", "sub": {...}}}.
    """

    def walk(p: str, depth_below: int, outermost: bool) -> dict:
        innermost = depth_below == 0
        if outermost:
            down_i, sub_i, up_i = 0, 1, 3
        elif innermost:
            down_i, sub_i, up_i = 1, None, 3
        else:
            down_i, sub_i, up_i = 1, 3, 5
        out = {"down": _conv(sd, f"{p}model.{down_i}"),
               "up": _convT(sd, f"{p}model.{up_i}")}
        if sub_i is not None:
            out["sub"] = walk(f"{p}model.{sub_i}.", depth_below - 1, False)
        return out

    return {"unet": walk(f"{prefix}model.", num_downs - 1, True)}


# ------------------------------------------------------------------ export
# JAX → torch (the reverse direction): emit a state_dict the *reference*
# loads with ``strict=True`` (``model/networks.py`` Sequential index
# layout), so models trained here serve in the upstream torch stack too.

def _rev_conv(p: Mapping, key: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{key}.weight"] = np.transpose(
        np.asarray(p["kernel"], np.float32), (3, 2, 0, 1))  # HWIO → OIHW
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"], np.float32)


def _rev_convT(p: Mapping, key: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{key}.weight"] = np.transpose(
        np.asarray(p["kernel"], np.float32), (2, 3, 0, 1))  # HWIO → IOHW
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"], np.float32)


def _rev_dense(p: Mapping, key: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{key}.weight"] = np.transpose(np.asarray(p["kernel"], np.float32))
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"], np.float32)


def export_resnet_generator(params: Mapping, prefix: str = "",
                            n_blocks: int = 9,
                            use_dropout: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_resnet_generator` — same torch index plan."""
    blk0 = 10
    up0 = blk0 + n_blocks
    conv2_idx = 6 if use_dropout else 5
    p = prefix
    sd: Dict[str, np.ndarray] = {}
    _rev_conv(params["c0"], f"{p}model.1", sd)
    _rev_conv(params["d0"], f"{p}model.4", sd)
    _rev_conv(params["d1"], f"{p}model.7", sd)
    for i in range(n_blocks):
        _rev_conv(params[f"r{i}"]["conv1"], f"{p}model.{blk0 + i}.conv_block.1", sd)
        _rev_conv(params[f"r{i}"]["conv2"],
                  f"{p}model.{blk0 + i}.conv_block.{conv2_idx}", sd)
    _rev_convT(params["u0"], f"{p}model.{up0}", sd)
    _rev_convT(params["u1"], f"{p}model.{up0 + 3}", sd)
    _rev_conv(params["c1"], f"{p}model.{up0 + 7}", sd)
    if "fc" in params:  # injection-variant extras (generator_inject.py:88-100)
        _rev_dense(params["fc"], f"{p}fc", sd)
    if "scale_param" in params:
        sd[f"{p}scale_param"] = np.asarray(params["scale_param"], np.float32)
    if "post_correction_param" in params:
        sd[f"{p}post_correction_param"] = np.asarray(
            params["post_correction_param"], np.float32)
    return sd


def export_nlayer_discriminator(params: Mapping, prefix: str = "",
                                n_layers: int = 3) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_nlayer_discriminator`."""
    p = prefix
    sd: Dict[str, np.ndarray] = {}
    _rev_conv(params["conv0"], f"{p}model.0", sd)
    for n in range(1, n_layers + 1):
        _rev_conv(params[f"conv{n}"], f"{p}model.{2 + 3 * (n - 1)}", sd)
    _rev_conv(params[f"conv{n_layers + 1}"], f"{p}model.{2 + 3 * n_layers}", sd)
    return sd


def export_pixel_discriminator(params: Mapping,
                               prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_pixel_discriminator`."""
    p = prefix
    sd: Dict[str, np.ndarray] = {}
    _rev_conv(params["conv0"], f"{p}net.0", sd)
    _rev_conv(params["conv1"], f"{p}net.2", sd)
    _rev_conv(params["conv2"], f"{p}net.5", sd)
    return sd


def export_unet_generator(params: Mapping, prefix: str = "",
                          num_downs: int = 8) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_unet_generator` — same recursive walk over
    the torch ``UnetSkipConnectionBlock`` nesting."""
    sd: Dict[str, np.ndarray] = {}

    def walk(tree: Mapping, p: str, depth_below: int, outermost: bool) -> None:
        innermost = depth_below == 0
        if outermost:
            down_i, sub_i, up_i = 0, 1, 3
        elif innermost:
            down_i, sub_i, up_i = 1, None, 3
        else:
            down_i, sub_i, up_i = 1, 3, 5
        _rev_conv(tree["down"], f"{p}model.{down_i}", sd)
        _rev_convT(tree["up"], f"{p}model.{up_i}", sd)
        if sub_i is not None:
            walk(tree["sub"], f"{p}model.{sub_i}.", depth_below - 1, False)

    walk(params["unet"], f"{prefix}model.", num_downs - 1, True)
    return sd


def export_px2px_checkpoint(params_g, params_d, config, path: str) -> str:
    """Write a reference-loadable ``.ckpt`` (``{"state_dict": {netG.*,
    netD.*}}`` with torch tensors) from flax param trees.  Either tree may
    be ``None``."""
    import jax
    import torch

    bc = config.base_configs
    sd_np: Dict[str, np.ndarray] = {}
    if params_g is not None:
        if bc.netG.startswith("unet"):
            sd_np.update(export_unet_generator(
                jax.device_get(params_g), prefix="netG.",
                num_downs=7 if bc.netG == "unet_128" else 8))
        else:
            sd_np.update(export_resnet_generator(
                jax.device_get(params_g), prefix="netG.",
                n_blocks=9 if bc.netG == "resnet_9blocks" else 6,
                use_dropout=not bc.no_dropout))
    if params_d is not None:
        pd = jax.device_get(params_d)
        if bc.netD == "pixel":
            sd_np.update(export_pixel_discriminator(pd, prefix="netD."))
        else:
            sd_np.update(export_nlayer_discriminator(
                pd, prefix="netD.",
                n_layers=3 if bc.netD == "basic" else bc.n_layers_D))
    state_dict = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd_np.items()}
    torch.save({"state_dict": state_dict}, path)
    return path
