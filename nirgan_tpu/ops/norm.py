"""Normalisation ops (NHWC).

The reference uses affine-free, stat-free InstanceNorm everywhere
(``model/networks.py:30``: ``nn.InstanceNorm2d(affine=False,
track_running_stats=False)``).  Statistics are computed in float32 even under
bfloat16 compute — the variance subtraction is catastrophic in bf16 — then the
normalised result is cast back.  XLA fuses this chain of elementwise +
reduction ops into the surrounding convs on TPU.
"""

import os

import jax
import jax.numpy as jnp

# Pallas path (ops/pallas_kernels.py): opt-in via NIRGAN_PALLAS_IN=1 — the
# generator's IN cost lives mostly in layers whose blocks exceed VMEM, so
# the XLA lowering is the measured production default (benchmarks/RESULTS.md).
_PALLAS_ENABLED = os.environ.get("NIRGAN_PALLAS_IN", "0") == "1"


def instance_norm(x, eps: float = 1e-5):
    """Per-sample, per-channel spatial normalisation (torch defaults: eps=1e-5,
    biased variance).

    Statistics (mean, variance, rsqrt) are float32 regardless of compute
    dtype; the elementwise normalisation then runs in the input dtype, so
    under bf16 the big (B,H,W,C) intermediates stay 2-byte (halved HBM
    traffic vs normalising in f32).  Under float32 input this is exactly the
    all-f32 computation.  E[x²]−E[x]² in f32 is adequate here: post-conv
    activations are zero-centred at unit-ish scale.

    Dispatches to the fused Pallas kernel (ops/pallas_kernels.py) when the
    per-block footprint fits VMEM on TPU."""
    if _PALLAS_ENABLED and x.ndim == 4 and jax.default_backend() != "cpu":
        from nirgan_tpu.ops.pallas_kernels import fits_vmem, instance_norm_pallas

        if fits_vmem(x.shape, x.dtype):
            return instance_norm_pallas(x, eps)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True) - jnp.square(mean)
    scale = jnp.reciprocal(jnp.sqrt(var + eps))
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)
