"""Bisect the inject route's cross-stack delta (VERDICT r3 item 3).

parity_report.json `inject_512` records 64 dB / max|Δ| 3.4e-3 where the
plain/concat routes sit at 126 dB / 2e-6.  The inject forward adds three
unique stages (fc → bilinear-resize of the 128² plane → multiply, plus the
post-correction scalar); this script recreates the exact parity-test setup
(tests/test_visual_parity.py::test_trained_inject_visual_parity_512) and
compares the intermediates stage by stage between the torch reference and
the JAX stack, printing max|Δ| at each tap point.

CPU-only (forces the platform per CLAUDE.md — never probe the backend).
Run: python benchmarks/debug_inject_bisect.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.conftest import REPO_ROOT  # noqa: E402
from tests.test_visual_parity import (  # noqa: E402
    _imagery_like_tiles,
    _load_ref_inject,
    _ref_inject_cfg,
)


def dmax(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def main():
    networks, ref_inject = _load_ref_inject()
    assert ref_inject is not None

    torch.manual_seed(0)
    norm = networks.get_norm_layer("instance")
    tnet = ref_inject.ResnetGenerator_inject(
        _ref_inject_cfg(), norm_layer=norm, n_blocks=9)

    rng = np.random.default_rng(0)
    embeds_tr = torch.from_numpy(rng.standard_normal((4, 256)).astype(np.float32))
    x = _imagery_like_tiles(4, 96, seed=1)
    target = (0.7 * x[:, 1:2] + 0.3 * x[:, 0:1]).clamp(0, 1) * 2 - 1
    opt = torch.optim.Adam(tnet.parameters(), lr=2e-4, betas=(0.5, 0.999))
    tnet.train()
    for _ in range(25):
        opt.zero_grad()
        loss = torch.nn.functional.l1_loss(tnet(x, embeds_tr), target)
        loss.backward()
        opt.step()

    size = 512
    xe = _imagery_like_tiles(1, size, seed=2)
    embeds = rng.standard_normal((1, 256)).astype(np.float32)
    tnet.eval()
    taps = {}
    with torch.no_grad():
        xp = torch.nn.functional.pad(xe, (10,) * 4, mode="reflect")
        h = tnet.model[:6](xp)
        taps["pre_inject_h"] = h.numpy()
        e = tnet.fc(torch.from_numpy(embeds))
        taps["fc_out"] = e.numpy()
        e = e.view(-1, 1, 128, 128)
        e = torch.nn.functional.interpolate(
            e, size=(h.shape[-1], h.shape[-2]), mode="bilinear",
            align_corners=False)
        taps["plane_resized"] = e.numpy()
        e = e.repeat(1, h.shape[-3], 1, 1)
        h = h * (1 + tnet.scale_param * e)
        taps["post_inject_h"] = h.numpy()
        h = tnet.model[6:10](h)  # relu, d1 conv, norm, relu
        taps["post_d1"] = h.numpy()
        for i in range(9):  # 9 resnet blocks (model[10:19])
            h = tnet.model[10 + i](h)
            taps[f"post_r{i}"] = h.numpy()
        taps["post_trunk"] = h.numpy()
        h = tnet.model[19](h)  # u0 convT
        taps["u0_conv"] = h.numpy()
        h = tnet.model[20](h)  # norm
        taps["post_nu0"] = h.numpy()
        h = tnet.model[21:24](h)  # relu, u1 conv, norm
        taps["post_nu1"] = h.numpy()
        h = tnet.model[24:](h)  # relu, pad, head conv, tanh
        taps["pre_pc"] = h.numpy()
        h = h * tnet.post_correction_param
        taps["final"] = h[:, :, 10:-10, 10:-10].numpy()
    print(f"torch scale_param={float(tnet.scale_param):.8f}  "
          f"post_correction={float(tnet.post_correction_param):.8f}")

    # ---- JAX stack, same weights ---------------------------------------
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    cfg = load_config(os.path.join(REPO_ROOT, "configs/config_px2px_SatCLIP.yaml"))
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [size]
    task = Px2PxTask(cfg)
    task.satclip_model.predict = lambda coords: embeds
    sd = {f"netG.{k}": v.detach().numpy().copy()
          for k, v in tnet.state_dict().items()}
    state = task.init_state(seed=0, image_size=96)
    loaded = task.load_torch_weights(sd)
    params = merge_params(jax.device_get(state.params_g), loaded["params_g"])
    task.bind(params)

    # re-run the forward with taps, mirroring models/generator.py exactly
    import jax.numpy as jnp

    from nirgan_tpu.ops.pad import reflect_pad2d
    from nirgan_tpu.ops.resize import resize_bilinear

    net = task.netG
    p = params["params"] if "params" in params else params

    xj = jnp.transpose(jnp.asarray(xe.numpy()), (0, 2, 3, 1))
    xj = reflect_pad2d(xj, 10)

    variables = {"params": p}

    def run_tap(method):
        return np.asarray(net.apply(variables, method=method))

    # use the module's own pieces via a capture wrapper
    captured = {}

    def fwd(module, x, embeds):
        from nirgan_tpu.models.generator import ResnetGenerator  # noqa

        return module(x, embeds=embeds, train=False)

    # Simplest faithful taps: call apply on sub-computations via
    # nn.apply-style manual re-execution.
    from flax.core import freeze  # noqa: F401

    from nirgan_tpu.models.layers import Norm, TorchConv, TorchConvTranspose, TorchDense  # noqa

    # Instead of re-implementing, monkeypatch jnp ops is messy — use
    # capture_intermediates on named module boundaries.
    out, mods = net.apply(variables, xj, jnp.asarray(embeds),
                          capture_intermediates=True, mutable=["intermediates"])
    inter = mods["intermediates"]

    def flat(tree, prefix=""):
        res = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                res.update(flat(v, prefix + k + "/"))
            else:
                res[prefix + k] = v
        return res

    names = {k: v[0] for k, v in flat(inter).items()}

    def t2j(a):  # torch NCHW numpy -> NHWC
        return np.transpose(a, (0, 2, 3, 1))

    def cmp(tag, jax_name, torch_arr, relu=False):
        j = np.asarray(names[jax_name])
        t = t2j(torch_arr)
        if relu:
            j, t = np.maximum(j, 0), np.maximum(t, 0)
        print(f"{tag:16s} max|Δ| {dmax(j, t):.3e}   "
              f"(|x| max {np.abs(t).max():.2f})")

    # fc output + resized plane (my side recomputed from converted params)
    fcw = p["fc"]
    e_j = np.asarray(jnp.asarray(embeds) @ fcw["kernel"] + fcw["bias"])
    print(f"{'fc_out':16s} max|Δ| {dmax(e_j, taps['fc_out']):.3e}   "
          f"(|x| max {np.abs(taps['fc_out']).max():.2f})")
    plane_j = np.asarray(resize_bilinear(
        jnp.asarray(e_j).reshape(1, 128, 128, 1), 266, 266))
    print(f"{'plane_resized':16s} max|Δ| "
          f"{dmax(plane_j[..., 0], taps['plane_resized'][:, 0]):.3e}   "
          f"(|x| max {np.abs(taps['plane_resized']).max():.2f})")

    cmp("pre_inject(nd0)", "nd0/__call__", taps["pre_inject_h"])
    post_inject_j = np.asarray(names["nd0/__call__"]) * (
        1.0 + float(p["scale_param"]) * plane_j)
    print(f"{'post_inject':16s} max|Δ| "
          f"{dmax(post_inject_j, t2j(taps['post_inject_h'])):.3e}   "
          f"(|x| max {np.abs(taps['post_inject_h']).max():.2f})")
    cmp("post_d1+relu", "nd1/__call__", taps["post_d1"], relu=True)
    for i in range(9):
        cmp(f"r{i}", f"r{i}/__call__", taps[f"post_r{i}"])

    cmp("u0_conv", "u0/__call__", taps["u0_conv"])
    cmp("post_nu0", "nu0/__call__", taps["post_nu0"])
    cmp("post_nu1", "nu1/__call__", taps["post_nu1"])
    # cross-check: torch u0+norm applied to the JAX r8 capture — isolates
    # whether the u-stage mismatch is weights/op (would differ) or input
    with torch.no_grad():
        r8_j = torch.from_numpy(
            np.transpose(np.asarray(names["r8/__call__"], np.float32),
                         (0, 3, 1, 2)))
        t_u0_of_jr8 = tnet.model[19:21](r8_j).numpy()
    print(f"{'t_u0(j_r8)~j_nu0':16s} max|Δ| "
          f"{dmax(t2j(t_u0_of_jr8), np.asarray(names['nu0/__call__'])):.3e}")
    print("param keys:", sorted(p.keys()))
    print(f"jax   scale_param={float(p['scale_param']):.8f}")

    # final output comparison
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))[:, :, 10:-10, 10:-10]
    print(f"{'final':16s} max|Δ| {dmax(got, taps['final']):.3e}")
    # ROOT CAUSE (round 4): the torch side trains WITH post_correction
    # (_ref_inject_cfg) but the shipped YAML — and hence the JAX task here —
    # has it OFF, so the trained 0.9965 output scalar is never applied on
    # the JAX side: max|Δ| ≈ (1−pc)·|pred|.  Dividing it out recovers the
    # other routes' 1e-5-grade agreement:
    pc = float(p.get("post_correction_param", 1.0))
    if "post_correction_param" not in p:
        print("jax params carry NO post_correction_param (config has "
              "post_correction: False) — torch trained one:",
              float(tnet.post_correction_param))
        print(f"{'final/pc_torch':16s} max|Δ| "
              f"{dmax(got, taps['pre_pc'][:, :, 10:-10, 10:-10] * 1.0):.3e}"
              f"   (torch final WITHOUT its pc scalar)")


if __name__ == "__main__":
    main()
