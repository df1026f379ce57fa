"""int8 residual trunk for the serving generator (opt-in, PSNR-guarded).

The 9 ResNet blocks at ngf*4 channels carry ~77% of the serving FLOPs; the
v5e MXU runs int8×int8 at 2× the bf16 rate, and the isolated trunk measures
1.62× over production bf16 (benchmarks/int8_block_probe.py; full-forward
in-context A/B: benchmarks/int8_serving_ab.py, RESULTS.md).  The
formulation:

  * Affine-free InstanceNorm (reference ``model/networks.py:30``) is
    invariant to per-output-channel scale and shift, so the int8 conv's
    int32 accumulator is normalised **directly in accumulator units** —
    eps adjusted per channel (``eps' = eps / k_o²``) — and conv bias drops
    entirely (a channel constant in front of IN is a no-op).
  * **Per-input-channel activation scales are folded into the weights**:
    ``Σ_c w[c,o]·x_c = Σ_c (w[c,o]·s_c)·(x_c/s_c)``, so inputs quantise
    per channel at no runtime cost, and the folded kernel is then
    quantised per *output* channel (symmetric int8).  IN absorbs the
    combined per-output scale.
  * The accumulator is staged bf16 with f32 moment sums fused into the
    conv epilogue (measured fastest probe variant — no second int8
    quantisation stage between conv and norm).
  * The residual stream itself stays in the float compute dtype — only
    conv inputs are quantised — so quantisation error does not compound
    along the skip chain.
  * Calibration (`calibrate_trunk`) is one instrumented forward capturing
    per-channel abs-max of every block input and of every post-IN+ReLU
    inner activation; only (C,)-vectors leave the device.

Reference semantics reproduced: ``model/networks.py:377-434`` (ResnetBlock:
pad → conv3 → IN → ReLU → pad → conv3 → IN → +skip), serving-time only
(no dropout, no grad).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_IN_EPS = 1e-5  # torch InstanceNorm2d default (ops/norm.py)


def _pad2d(x, padding_type: str):
    mode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[padding_type]
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


def _conv_i8(x8, w8):
    return lax.conv_general_dilated(
        x8, w8, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _q8(v):
    return jnp.clip(jnp.rint(v), -127, 127).astype(jnp.int8)


def _quant_folded(w, s_in, eps: float = _IN_EPS):
    """Fold per-input-channel scales into an HWIO kernel, quantise per
    output channel, and return (w8, eps') for accumulator-unit IN."""
    wf = jnp.asarray(w, jnp.float32) * s_in[None, None, :, None]
    k = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0, 1e-12)
    return _q8(wf / k), eps / jnp.square(k)


def quantize_trunk(params, n_blocks: int, calib: dict) -> dict:
    """Build the int8 trunk pack from a generator param tree and the
    per-channel activation ranges from `calibrate_trunk`."""
    w1, w2, eps1, eps2, s_in, s_mid = [], [], [], [], [], []
    for i in range(n_blocks):
        blk = params[f"r{i}"]
        si = jnp.asarray(calib["in"][i], jnp.float32)
        sm = jnp.asarray(calib["mid"][i], jnp.float32)
        w1q, e1 = _quant_folded(blk["conv1"]["kernel"], si)
        w2q, e2 = _quant_folded(blk["conv2"]["kernel"], sm)
        w1.append(w1q)
        w2.append(w2q)
        eps1.append(e1)
        eps2.append(e2)
        s_in.append(si)
        s_mid.append(sm)
    pack = {"w1": w1, "w2": w2, "eps1": eps1, "eps2": eps2,
            "s_in": s_in, "s_mid": s_mid}
    if "d1_in" in calib:  # stage-2: the d1 downsample conv (int8_d1_forward)
        sd1 = jnp.asarray(calib["d1_in"], jnp.float32)
        wd1, ed1 = _quant_folded(params["d1"]["kernel"], sd1)
        pack["d1"] = {"w": wd1, "eps": ed1, "s_in": sd1}
    return pack


def _norm_from_moments(hb, m1, m2, eps_adj, n):
    """(acc − mean)·rsqrt(var + eps') from the bf16-staged accumulator and
    its f32 moment sums; equals the real-unit affine-free IN exactly."""
    mean = (m1 / n)[:, None, None, :]
    var = (m2 / n - jnp.square(m1 / n))[:, None, None, :]
    rstd = lax.rsqrt(var + eps_adj)
    return (hb.astype(jnp.float32) - mean) * rstd


def _conv_moments(x8, w8):
    acc = _conv_i8(x8, w8)
    a32 = acc.astype(jnp.float32)
    m1 = jnp.sum(a32, axis=(1, 2))
    m2 = jnp.sum(jnp.square(a32), axis=(1, 2))
    return a32.astype(jnp.bfloat16), m1, m2


def int8_d1_forward(x, qd1):
    """Stage-2 int8 (opt-in, default OFF — measured slower in context):
    the d1 downsample conv (3×3 stride-2 zero-pad, 2·ngf→4·ngf) plus its
    affine-free IN and ReLU, in the same accumulator-unit formulation as
    the trunk.  Zero padding is exact under symmetric quantisation (no
    zero point), and the conv bias drops in front of IN like the trunk
    convs'.  ``x``: the post-inject ReLU stream (B,H,W,2·ngf) float;
    returns f32 (B,H/2,W/2,4·ngf).

    Measurement record (benchmarks/RESULTS.md round 4): isolated d1 conv
    1.37× in int8 (int8_stage2_probe.py) but the full serving A/B with d1
    quantised is 1.28×/1.33× (b32/b128) vs 1.37×/1.36× trunk-only — the
    input quantise + f32 moment reduction costs more than the 1.07 ms the
    conv saves at d1's output size, so the mode ships opt-in and off.  The
    u0/u1 transposed convs stay bf16 by measurement too (int8 1.01× —
    XLA's double-rate path does not engage with lhs_dilation), and the
    stem/head are channel-starved (MXU-underfed; dtype cannot help).
    """
    x8 = _q8(x.astype(jnp.float32) / qd1["s_in"])
    acc = lax.conv_general_dilated(
        x8, qd1["w"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    a32 = acc.astype(jnp.float32)
    m1 = jnp.sum(a32, axis=(1, 2))
    m2 = jnp.sum(jnp.square(a32), axis=(1, 2))
    n = acc.shape[1] * acc.shape[2]
    y = _norm_from_moments(a32.astype(jnp.bfloat16), m1, m2, qd1["eps"], n)
    return jax.nn.relu(y)


def int8_trunk_forward(x, qpack, padding_type: str = "reflect"):
    """Run the residual trunk in int8.  ``x``: (B,H,W,C) float stream
    (the generator's post-``relu(nd1)`` activation); returns the same."""
    n_blocks = len(qpack["w1"])
    n = x.shape[1] * x.shape[2]
    for i in range(n_blocks):
        x8 = _q8(x.astype(jnp.float32) / qpack["s_in"][i])
        hb1, m1a, m2a = _conv_moments(_pad2d(x8, padding_type), qpack["w1"][i])
        y = jax.nn.relu(_norm_from_moments(hb1, m1a, m2a, qpack["eps1"][i], n))
        h8 = _q8(y / qpack["s_mid"][i])
        hb2, m1b, m2b = _conv_moments(_pad2d(h8, padding_type), qpack["w2"][i])
        y2 = _norm_from_moments(hb2, m1b, m2b, qpack["eps2"][i], n)
        x = x + y2.astype(x.dtype)
    return x


def calibrate_trunk(netG, params, x_padded, embeds=None,
                    n_blocks: Optional[int] = None, margin: float = 1.2,
                    stage2: bool = False):
    # margin 1.2-1.35 is the measured plateau: single-batch per-channel
    # absmax underestimates unseen activations (clipping) below it and
    # wastes uniform precision above it — 39.4 dB unseen at 1.2 vs 36.2 at
    # 1.02 / 37.4 at 2.0 (benchmarks/int8_margin_sweep.py, RESULTS.md).
    """One instrumented forward → per-channel quantisation scales.

    ``x_padded`` must already carry the serving reflect padding (the trunk
    sees padded spatial dims).  Runs jitted; only (C,)-vectors leave the
    device.  Returns {"in": [(C,)·n_blocks], "mid": [(C,)·n_blocks]} —
    the quant scales (absmax·margin/127) of each block's input stream and
    of each block's post-IN+ReLU inner activation.
    """
    nb = n_blocks if n_blocks is not None else netG.n_blocks
    inputs = {"nd1"} | {f"r{i}" for i in range(nb - 1)}
    if stage2:
        inputs = inputs | {"d1_in"}  # _Tap on the d1 input (generator.py)

    @jax.jit
    def ranges(p, x, e):
        args = (x,) if e is None else (x, e)
        _, st = netG.apply(
            {"params": p}, *args, train=False,
            capture_intermediates=lambda mdl, _: (mdl.name in inputs
                                                  or mdl.name == "norm1"),
            mutable=["intermediates"])
        inter = st["intermediates"]

        def amax(t):
            return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1, 2))

        s_in = [jnp.max(jax.nn.relu(
            inter["nd1"]["__call__"][0].astype(jnp.float32)), axis=(0, 1, 2))]
        s_in += [amax(inter[f"r{i}"]["__call__"][0]) for i in range(nb - 1)]
        s_mid = [jnp.max(jax.nn.relu(
            inter[f"r{i}"]["norm1"]["__call__"][0].astype(jnp.float32)),
            axis=(0, 1, 2)) for i in range(nb)]
        s_d1 = (amax(inter["d1_in"]["__call__"][0])
                if "d1_in" in inter else None)
        return s_in, s_mid, s_d1

    s_in, s_mid, s_d1 = jax.device_get(ranges(params, x_padded, embeds))
    k = margin / 127.0

    def clamp(v):
        # channels dead on the calibration batch get a floor relative to the
        # tensor's live range (their folded weights are ~0 anyway)
        return (v * k).clip(min=max(float(v.max()) * k * 1e-3, 1e-12))

    out = {"in": [clamp(v) for v in s_in], "mid": [clamp(v) for v in s_mid]}
    if s_d1 is not None:
        out["d1_in"] = clamp(s_d1)
    return out
