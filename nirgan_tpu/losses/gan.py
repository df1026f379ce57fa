"""GAN objectives (reference ``GANLoss`` at ``model/networks.py:210-276`` and
``cal_gradient_penalty`` at ``:279-313``).

Pure functions instead of a stateful module: the target tensor the torch
class materialises is just a scalar constant under broadcasting, so each mode
reduces to one fused elementwise+reduction expression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gan_loss", "gradient_penalty"]


def gan_loss(prediction, target_is_real: bool, gan_mode: str = "lsgan",
             real_label: float = 1.0, fake_label: float = 0.0):
    """Discriminator-output objective.

    lsgan    → MSE against the label plane
    vanilla  → BCE-with-logits against the label plane
    wgangp   → ∓mean(prediction)
    """
    pred = prediction.astype(jnp.float32)
    if gan_mode == "lsgan":
        target = real_label if target_is_real else fake_label
        return jnp.mean(jnp.square(pred - target))
    if gan_mode == "vanilla":
        target = real_label if target_is_real else fake_label
        # numerically-stable BCE with logits: max(x,0) - x*t + log(1+exp(-|x|))
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if gan_mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def gradient_penalty(
    apply_d,
    params_d,
    real_data,
    fake_data,
    rng,
    gp_type: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 10.0,
):
    """WGAN-GP penalty.  ``apply_d(params, x) -> logits``.

    The reference's ``torch.autograd.grad`` w.r.t. the interpolates becomes a
    single ``jax.grad`` of the summed critic output — identical maths, one
    fused backward under jit.  The 1e-16 eps inside the norm matches the
    reference's added epsilon (networks.py:310).
    """
    if lambda_gp <= 0.0:
        return jnp.float32(0.0)
    if gp_type == "real":
        interp = real_data
    elif gp_type == "fake":
        interp = fake_data
    elif gp_type == "mixed":
        alpha = jax.random.uniform(rng, (real_data.shape[0],) + (1,) * (real_data.ndim - 1))
        interp = alpha * real_data + (1.0 - alpha) * fake_data
    else:
        raise NotImplementedError(f"{gp_type} not implemented")

    grads = jax.grad(lambda x: jnp.sum(apply_d(params_d, x).astype(jnp.float32)))(interp)
    flat = (grads + 1e-16).reshape(grads.shape[0], -1).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(flat), axis=1))
    return jnp.mean(jnp.square(norms - constant)) * lambda_gp
