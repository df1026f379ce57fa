"""Functional train state: everything the reference scatters across the
LightningModule, two torch optimizers, and two LR schedulers
(``model/pix2pix.py:485-492``) as one pytree.

Learning rates live in the state as traced scalars so the host-side
plateau scheduler can change them without recompiling the step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    lr_g: jnp.ndarray
    lr_d: jnp.ndarray
    rng: Any
    # running statistics for norm='batch' nets (empty dicts otherwise)
    stats_g: Any = flax.struct.field(default_factory=dict)
    stats_d: Any = flax.struct.field(default_factory=dict)


def adam_for(params, beta1: float = 0.5):
    """Adam with unit LR; the step scales updates by the state's live LR.
    Matches torch Adam(lr, betas=(beta1, 0.999), eps=1e-8) semantics."""
    return optax.chain(optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8),
                       optax.scale(-1.0))


def create_state(rng, params_g, params_d, lr: float, beta1: float = 0.5,
                 stats_g=None, stats_d=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_g=adam_for(params_g, beta1).init(params_g),
        opt_d=adam_for(params_d, beta1).init(params_d),
        lr_g=jnp.asarray(lr, jnp.float32),
        lr_d=jnp.asarray(lr, jnp.float32),
        rng=rng,
        stats_g=stats_g if stats_g is not None else {},
        stats_d=stats_d if stats_d is not None else {},
    )


def param_count(tree) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))
