"""Weight initialisers matching the reference's ``init_weights`` dispatch
(``model/networks.py:68-99``): normal | xavier | kaiming | orthogonal, applied
to conv/linear weights with N(0, 0.02) as the pix2pix default, biases zero.

Kernels are stored HWIO; fan computation follows torch conventions
(fan_in = kh*kw*Cin, fan_out = kh*kw*Cout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) == 4:  # HWIO conv kernel
        rf = shape[0] * shape[1]
        return shape[2] * rf, shape[3] * rf
    if len(shape) == 2:  # (in, out) dense kernel
        return shape[0], shape[1]
    raise ValueError(f"unsupported kernel shape {shape}")


def normal(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal():
    # torch kaiming_normal_(a=0, mode='fan_in') → std = sqrt(2 / fan_in)
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        std = (2.0 / fan_in) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


def orthogonal(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        # torch orthogonalises over (out, prod(rest)) of the OIHW tensor;
        # HWIO ↔ OIHW differ by a transpose, orthogonality is preserved.
        flat_out = shape[-1]
        flat_in = 1
        for s in shape[:-1]:
            flat_in *= s
        q = jax.nn.initializers.orthogonal(scale=gain)(key, (flat_in, flat_out), dtype)
        return q.reshape(shape)

    return init


def batchnorm_scale_init(key, shape, dtype=jnp.float32):
    # reference init_weights: BatchNorm weight ~ N(1.0, init_gain)
    # (model/networks.py:94-96)
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def get_initializer(init_type: str, init_gain: float = 0.02):
    """String dispatch mirroring reference ``init_weights`` (networks.py:79-91)."""
    if init_type == "normal":
        return normal(init_gain)
    if init_type == "xavier":
        return xavier_normal(init_gain)
    if init_type == "kaiming":
        return kaiming_normal()
    if init_type == "orthogonal":
        return orthogonal(init_gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")
