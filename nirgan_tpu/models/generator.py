"""ResNet encoder–decoder generator (TPU-native rebuild of the reference
``ResnetGenerator`` / ``ResnetGenerator_inject``, ``model/networks.py:316-434``
and ``model/generator_inject.py:7-135``).

Design notes (TPU-first, not a translation):
  * NHWC layout end-to-end; all convs are single ``lax.conv_general_dilated``
    calls in (NHWC, HWIO) so XLA tiles them onto the MXU.
  * Instance-norm + activation chains are left to XLA fusion (f32 statistics
    under bf16 compute — see ``ops/norm.py``).
  * The SatCLIP injection variant is folded into the same module instead of a
    class copy: embedding FC → 128² plane → bilinear resize (a 2-matmul MXU
    op, ``ops/resize.py``) → broadcast-multiply into the post-downsample
    feature map.  Semantics match the reference exactly, including the
    split point *after* the first downsample conv's norm and *before* its
    ReLU (``model/generator_inject.py:107`` splits at ``model[:6]``).
  * Static shapes only; arbitrary tile sizes are handled by the predictor's
    pad-to-bucket logic, not by the network.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from nirgan_tpu.models.layers import (
    Norm,
    TorchConv,
    TorchConvTranspose,
    TorchDense,
    use_bias_for,
)
from nirgan_tpu.ops import initializers as inits
from nirgan_tpu.ops.blocked_stem import conv_valid_blocked, stem_downsample_blocked
from nirgan_tpu.ops.reflect_conv import (
    conv2d_reflect,
    conv_valid_blocked_reflect,
    stem_downsample_blocked_reflect,
)
from nirgan_tpu.ops.pad import reflect_pad2d
from nirgan_tpu.ops.resize import resize_bilinear


def _use_pallas_head(x_shape, k_shape) -> bool:
    """Opt-in experimental Pallas head (NIRGAN_PALLAS_HEAD=1, TPU only) —
    see ops/pallas_head.py for the measured status."""
    import os

    import jax

    if os.environ.get("NIRGAN_PALLAS_HEAD", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    from nirgan_tpu.ops.pallas_head import head_conv_supported

    return head_conv_supported(x_shape, k_shape)


def _pad(x, padding_type: str, amount: int = 1):
    if padding_type == "reflect":
        return reflect_pad2d(x, amount)
    if padding_type == "replicate":
        return jnp.pad(x, ((0, 0), (amount, amount), (amount, amount), (0, 0)), mode="edge")
    if padding_type == "zero":
        return jnp.pad(x, ((0, 0), (amount, amount), (amount, amount), (0, 0)))
    raise NotImplementedError(f"padding [{padding_type}] is not implemented")


class _Tap(nn.Module):
    """Parameter-free identity; exists so serving-time calibration can
    capture inner activations that are not module outputs (the post-inject
    ReLU stream feeding d1 — ``ops/int8_trunk.py calibrate_trunk``).
    Creates no params, so checkpoints are unaffected."""

    @nn.compact
    def __call__(self, x):
        return x


class ResnetBlock(nn.Module):
    """Residual block: pad → conv3 → norm → relu (→ dropout) → pad → conv3 →
    norm, plus identity skip (reference ``model/networks.py:377-434``)."""

    dim: int
    padding_type: str = "reflect"
    norm_type: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    kernel_init: Callable = inits.normal(0.02)
    param_dtype: Any = jnp.float32
    # Fold the reflect pads into the convs (ops/reflect_conv.py): the
    # explicit pad is a sublane relayout + fusion barrier measured at 28%
    # of the generator fwd+bwd in context (benchmarks/padfold_ab.py).
    # Math-identical (borders recomputed exactly); flag kept for A/B.
    # TRAIN-ONLY: the fold's backward win is large (532² G step 519→401 ms)
    # but its forward-only form is a small net loss (the strip convs +
    # border updates cost slightly more than the pad they replace), so
    # serving keeps the explicit-pad graph.
    reflect_fold: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        import os

        p = 1 if self.padding_type == "zero" else 0
        # NIRGAN_FOLD_SERVE=1: experimental serve-side trunk fold (the
        # fold is train-gated by measurement — in-context it loses 3-5%;
        # benchmarks/servefold_ab.py).  Read at TRACE time and not part of
        # any jit cache key: set it before the first compile (the A/B
        # builds a fresh jit per variant); toggling it against an already-
        # jitted function silently reuses the old graph.
        fold = (self.reflect_fold and self.padding_type == "reflect"
                and (train or os.environ.get("NIRGAN_FOLD_SERVE") == "1"))
        conv1 = TorchConv(
            self.dim, 3, padding=p, use_bias=self.use_bias,
            kernel_init=self.kernel_init, param_dtype=self.param_dtype, name="conv1",
        )
        if fold:
            k1, b1 = conv1(x, return_params=True)
            h = conv2d_reflect(x, k1, b1, pad=1)
        else:
            h = x if p else _pad(x, self.padding_type)
            h = conv1(h)
        h = Norm(self.norm_type, name="norm1")(h, train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        conv2 = TorchConv(
            self.dim, 3, padding=p, use_bias=self.use_bias,
            kernel_init=self.kernel_init, param_dtype=self.param_dtype, name="conv2",
        )
        if fold:
            k2, b2 = conv2(h, return_params=True)
            h = conv2d_reflect(h, k2, b2, pad=1)
        else:
            h = h if p else _pad(h, self.padding_type)
            h = conv2(h)
        h = Norm(self.norm_type, name="norm2")(h, train)
        return x + h


class ResnetGenerator(nn.Module):
    """c7s1-64, d128, d256, R256×n, u128, u64, c7s1-out, tanh.

    With ``inject=True`` this is the reference's ``ResnetGenerator_inject``:
    a 256-d location embedding is projected to a 128×128 plane, resized to
    the feature map, channel-broadcast, and combined add/multiply-style with
    an optional learnable scale, plus an optional learnable post-correction
    on the output (``model/generator_inject.py:88-135``).
    """

    input_nc: int
    output_nc: int
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 9
    padding_type: str = "reflect"
    # --- injection variant ---
    inject: bool = False
    inject_style: str = "multiply"  # ['add', 'multiply']
    scaling_param: bool = True
    scaling_param_init: float = 0.01
    post_correction: bool = False
    post_correction_init: float = 1.0
    embed_dim: int = 256
    embed_plane: int = 128  # fc output is a 128×128 plane (generator_inject.py:89)
    # --- numerics ---
    kernel_init: Callable = inits.normal(0.02)
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # Space-to-depth stem (ops/blocked_stem.py): runs the channel-starved
    # 7×7 stem and stride-2 d0 convs in 2×2 blocked layout (measured ~3×
    # faster on TPU, math-identical).  Auto-falls back when inapplicable.
    blocked_stem: bool = True
    # Fold reflect pads into the convs everywhere (ops/reflect_conv.py):
    # exact, and removes the dominant relayout/fusion-barrier cost
    # (benchmarks/padfold_ab.py).  Flag kept for A/B.
    reflect_fold: bool = True
    # Fold the INPUT pads (the task-level reflect-pad-10 and the stem's
    # reflect-pad-3) into the blocked stem conv via composed-reflect border
    # strips (ops/reflect_conv.py stem_downsample_blocked_reflect).  Exact
    # and fully tested, but MEASURED NEUTRAL-TO-SLIGHTLY-SLOWER in the real
    # graphs (benchmarks/stemfold_ab.py, two runs: serve b128@512² 445.0 vs
    # 443.3 ms, train G fwd+bwd b32@256² 109.0 vs 108.1 ms) — the explicit
    # 3-channel input pads are cheap at these layouts, unlike the trunk/head
    # pads the train-gated fold removes.  Default OFF; kept as the measured
    # close of the input-pad line.
    fold_input_pads: bool = False

    @nn.compact
    def __call__(self, x, embeds: Optional[jnp.ndarray] = None, train: bool = False,
                 trunk_q=None, outer_pad: int = 0):
        """``outer_pad > 0`` means ``x`` is the RAW (unpadded) input and the
        task-level reflect pad (``model/pix2pix.py:91-93``) is folded into
        the blocked stem together with the stem's own reflect-pad-3 —
        the output equals ``self(reflect_pad2d(x, outer_pad), …)`` exactly.
        When the blocked-stem fold can't take the fold (odd sizes, batch
        norm, flag off), the pad is applied explicitly here instead."""
        assert self.n_blocks >= 0
        if trunk_q is not None and (train or self.norm_type != "instance"):
            raise ValueError("int8 trunk is a serving-only path and requires "
                             "affine-free InstanceNorm (norm_type='instance')")
        use_bias = use_bias_for(self.norm_type)
        kw = dict(kernel_init=self.kernel_init, param_dtype=self.param_dtype)
        x = x.astype(self.compute_dtype)

        c0 = TorchConv(self.ngf, 7, use_bias=use_bias, name="c0", **kw)
        n0 = Norm(self.norm_type, name="n0")
        d0 = TorchConv(self.ngf * 2, 3, stride=2, padding=1, use_bias=use_bias, name="d0", **kw)

        use_blocked = (
            self.blocked_stem
            and self.norm_type == "instance"
            and (x.shape[1] + 2 * outer_pad) % 2 == 0
            and (x.shape[2] + 2 * outer_pad) % 2 == 0
        )
        fold_stem = self.reflect_fold and self.fold_input_pads
        if outer_pad and not (use_blocked and fold_stem):
            x = reflect_pad2d(x, outer_pad)
            outer_pad = 0
        if use_blocked:
            # stem 7×7 conv → IN → ReLU → d0 conv, all in blocked layout;
            # the full-res ngf-channel tensor is never materialised.
            k7, b7 = c0(x, return_params=True)
            # param-only call: only the trailing (channel) dim of the dummy
            # is read, so d0's kernel gets its real Cin=ngf
            k3, b3 = d0(jnp.zeros((1, 1, 1, self.ngf), x.dtype), return_params=True)
            # the stem pad is unconditionally reflect in the reference
            # (networks.py:341) — padding_type only switches the trunk
            if fold_stem:
                # opt-in: fold the stem's reflect-pad-3 — and, when
                # outer_pad is set, the task's reflect-pad-10 — into the
                # blocked conv (zero-SAME + exact composed border strips,
                # ops/reflect_conv.py).  Measured neutral-to-slightly-
                # slower in the real graphs (see fold_input_pads above).
                h = stem_downsample_blocked_reflect(x, k7, b7, k3, b3,
                                                    outer=outer_pad)
            else:
                h = stem_downsample_blocked(_pad(x, "reflect", 3),
                                            k7, b7, k3, b3)
        else:
            # stem: reflect-pad 3 + 7×7 conv (train-only fold, see
            # ResnetBlock.reflect_fold)
            if self.reflect_fold and train:
                k7, b7 = c0(x, return_params=True)
                h = conv2d_reflect(x, k7, b7, pad=3)
            else:
                h = _pad(x, "reflect", 3)
                h = c0(h)
            h = n0(h, train)
            h = nn.relu(h)
            # downsampling ×2
            h = d0(h)
        h = Norm(self.norm_type, name="nd0")(h, train)

        if self.inject:
            h = self._inject(h, embeds)

        h = nn.relu(h)
        h = _Tap(name="d1_in")(h)
        if trunk_q is not None and "d1" in trunk_q:
            # stage-2 int8: d1 conv + IN + ReLU in accumulator units
            # (1.37× measured on the shape, benchmarks/int8_stage2_probe.py;
            # the bf16 d1/nd1 modules are simply not constructed — flax
            # apply tolerates unused param-tree entries, same as the trunk)
            from nirgan_tpu.ops.int8_trunk import int8_d1_forward

            h = int8_d1_forward(h, trunk_q["d1"]).astype(self.compute_dtype)
        else:
            h = TorchConv(self.ngf * 4, 3, stride=2, padding=1, use_bias=use_bias, name="d1", **kw)(h)
            h = Norm(self.norm_type, name="nd1")(h, train)
            h = nn.relu(h)

        # residual trunk — optionally in int8 (ops/int8_trunk.py, opt-in
        # serving mode; 1.62× measured, benchmarks/int8_block_probe.py).
        # The bf16 blocks are simply not constructed under trunk_q: flax
        # apply tolerates unused entries in the param tree, so the same
        # checkpoint params serve both paths.
        if trunk_q is not None:
            from nirgan_tpu.ops.int8_trunk import int8_trunk_forward

            h = int8_trunk_forward(h, trunk_q, self.padding_type)
        for i in range(self.n_blocks if trunk_q is None else 0):
            h = ResnetBlock(
                self.ngf * 4,
                padding_type=self.padding_type,
                norm_type=self.norm_type,
                use_dropout=self.use_dropout,
                use_bias=use_bias,
                param_dtype=self.param_dtype,
                kernel_init=self.kernel_init,
                reflect_fold=self.reflect_fold,
                name=f"r{i}",
            )(h, train)

        # upsampling ×2
        h = TorchConvTranspose(self.ngf * 2, 3, use_bias=use_bias, name="u0", **kw)(h)
        h = Norm(self.norm_type, name="nu0")(h, train)
        h = nn.relu(h)
        h = TorchConvTranspose(self.ngf, 3, use_bias=use_bias, name="u1", **kw)(h)
        h = Norm(self.norm_type, name="nu1")(h, train)
        h = nn.relu(h)

        # head: reflect-pad 3 + 7×7 conv + tanh (bias always on, networks.py:367)
        c1 = TorchConv(self.output_nc, 7, use_bias=True, name="c1", **kw)
        head_factor = 4 if (h.shape[1] % 4 == 0 and h.shape[2] % 4 == 0) else (
            2 if (h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0) else 1
        )
        if self.blocked_stem and head_factor > 1:
            # Cout=1 starves the MXU (measured 47 ms of the 512² forward);
            # run the conv in space-to-depth layout and interleave only the
            # tiny 1-channel output (ops/blocked_stem.py).
            kh_, bh_ = c1(h, return_params=True)
            pallas_shape = (h.shape[0], h.shape[1] + 6, h.shape[2] + 6, h.shape[3])
            if _use_pallas_head(pallas_shape, kh_.shape):
                from nirgan_tpu.ops.pallas_head import head_conv_pallas

                h = head_conv_pallas(_pad(h, "reflect", 3), kh_)
                if bh_ is not None:
                    h = h + bh_.astype(h.dtype)
            elif self.reflect_fold:
                # pad folded into the strided conv (ops/reflect_conv.py).
                # Unlike the trunk fold this one stays on for SERVING too:
                # forward measured −1.1/−1.8 ms (532²/276² b32, head-only
                # rows of benchmarks/padfold_ab.py) plus −40 ms backward.
                h = conv_valid_blocked_reflect(h, kh_, bh_, factor=head_factor)
            else:
                h = conv_valid_blocked(_pad(h, "reflect", 3), kh_, bh_,
                                       factor=head_factor)
        elif self.reflect_fold and train:
            kh_, bh_ = c1(h, return_params=True)
            h = conv2d_reflect(h, kh_, bh_, pad=3)
        else:
            h = _pad(h, "reflect", 3)
            h = c1(h)
        h = jnp.tanh(h)

        if self.inject and self.post_correction:
            pc = self.param(
                "post_correction_param",
                lambda k, s: jnp.full(s, self.post_correction_init, self.param_dtype),
                (),
            )
            h = h * pc.astype(h.dtype)
        return h

    def _inject(self, h, embeds):
        if embeds is None:
            raise ValueError("inject-style generator requires a location embedding input")
        embeds = embeds.astype(self.compute_dtype)
        plane = TorchDense(self.embed_plane * self.embed_plane, name="fc",
                           param_dtype=self.param_dtype)(embeds)
        plane = plane.reshape(-1, self.embed_plane, self.embed_plane, 1)
        # reference passes size=(W, H) — swapped — to F.interpolate
        # (generator_inject.py:116); replicated verbatim for parity.
        plane = resize_bilinear(plane, h.shape[-2], h.shape[-3])
        plane = jnp.broadcast_to(plane, (*plane.shape[:3], h.shape[-1]))

        if self.scaling_param:
            scale = self.param(
                "scale_param",
                lambda k, s: jnp.full(s, self.scaling_param_init, self.param_dtype),
                (),
            ).astype(h.dtype)
        if self.inject_style == "add":
            return h + scale * plane
        if self.inject_style == "multiply" and self.scaling_param:
            return h * (1.0 + scale * plane)
        if self.inject_style == "multiply":
            return h * plane
        raise NotImplementedError(f"inject style [{self.inject_style}] is not implemented")
