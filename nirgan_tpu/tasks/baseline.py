"""Baseline regression task (reference ``model/baseline_models.py``):
MSE-only training with the shared data contract and val logging, reusing the
Px2Px trainer loop.  Presents the same surface as Px2PxTask (init_state /
make_train_step / make_eval_step / extract_batch / predict_step) so the
Trainer is model-agnostic."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

import flax.struct

from nirgan_tpu.config import ConfigNode, tpu_section
from nirgan_tpu.losses import calculate_metrics, mse_loss
from nirgan_tpu.models.baselines import build_baseline
from nirgan_tpu.models.layers import dtype_of
from nirgan_tpu.parallel import batch_sharding, replicated_sharding
from nirgan_tpu.runtime.setup import default_compiler_options
from nirgan_tpu.tasks.px2px import nchw_to_nhwc, nhwc_to_nchw

__all__ = ["BaselineTask", "BaselineState"]


@flax.struct.dataclass
class BaselineState:
    step: jnp.ndarray
    params_g: any  # generator naming kept so Trainer/ckpt code is shared
    opt_g: any
    lr_g: jnp.ndarray
    lr_d: jnp.ndarray  # unused; keeps the Trainer surface identical
    rng: any

    @property
    def params_d(self):
        return {}


class BaselineTask:
    satclip = False
    satclip_style = None
    lambda_rs = 0.0
    rs_losses = None

    def __init__(self, config: ConfigNode):
        self.config = config
        tpu = tpu_section(config)
        self.compute_dtype = dtype_of(tpu.compute_dtype)
        self.model = build_baseline(config.base_configs.model_name,
                                    compute_dtype=self.compute_dtype)
        self.lr = float(config.base_configs.learning_rate)
        self.shape_buckets = sorted(int(b) for b in tpu.shape_buckets)
        self._tx = optax.adam(1.0)  # unit-LR; scaled by live lr in the step

    def init_state(self, seed: int = 0, image_size: int = 64) -> BaselineState:
        k = jax.random.key(seed)
        kp, kr = jax.random.split(k)
        params = self.model.init(kp, jnp.zeros((1, image_size, image_size, 3)))["params"]
        tx = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
        self._tx = tx
        return BaselineState(step=jnp.zeros((), jnp.int32), params_g=params,
                             opt_g=tx.init(params),
                             lr_g=jnp.asarray(self.lr, jnp.float32),
                             lr_d=jnp.asarray(self.lr, jnp.float32),
                             rng=kr)

    def extract_batch(self, batch):
        return {"rgb": nchw_to_nhwc(np.asarray(batch["rgb"], np.float32)),
                "nir": nchw_to_nhwc(np.asarray(batch["nir"], np.float32))}

    def make_train_step(self, mesh=None):
        tx = self._tx

        def step(state: BaselineState, batch):
            rgb = batch["rgb"].astype(self.compute_dtype)
            nir = batch["nir"]

            def loss_fn(params):
                pred = self.model.apply({"params": params}, rgb, train=True)
                return mse_loss(pred, nir), pred

            (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params_g)
            upd, opt = tx.update(grads, state.opt_g, state.params_g)
            upd = jax.tree.map(lambda u: u * state.lr_g, upd)
            params = jax.tree.map(lambda p, u: p + u, state.params_g, upd)
            metrics = {"train/loss": loss,
                       "model_loss/generator_total_loss": loss,
                       **calculate_metrics(jax.lax.stop_gradient(pred), nir, "train")}
            return (state.replace(step=state.step + 1, params_g=params, opt_g=opt),
                    {k: v.astype(jnp.float32) for k, v in metrics.items()})

        copts = default_compiler_options("train")
        if mesh is None:
            return jax.jit(step, donate_argnums=(0,), compiler_options=copts)
        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, data), out_shardings=(repl, repl),
                       donate_argnums=(0,), compiler_options=copts)

    def make_eval_step(self, mesh=None):
        def step(state, batch):
            pred = self.model.apply({"params": state.params_g},
                                    batch["rgb"].astype(self.compute_dtype))
            return pred.astype(jnp.float32), calculate_metrics(
                pred, batch["nir"], "val", mask=batch.get("_valid"))

        copts = default_compiler_options()
        if mesh is None:
            return jax.jit(step, compiler_options=copts)
        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        return jax.jit(step, in_shardings=(repl, data), out_shardings=(data, repl),
                       compiler_options=copts)

    def bind(self, state_or_params):
        self._params = getattr(state_or_params, "params_g", state_or_params)
        return self

    def predict_step(self, rgb, coords: Optional[np.ndarray] = None):
        x = nchw_to_nhwc(np.asarray(rgb, np.float32))
        pred = jax.jit(lambda p, x: self.model.apply({"params": p}, x))(self._params, x)
        return np.asarray(nhwc_to_nchw(pred))

    def load_torch_weights(self, path: str):
        """Weights-only warm start from a reference baseline Lightning ckpt
        (shared mechanism of ``train.py:61-65``)."""
        from nirgan_tpu.train.torch_convert import convert_baseline, load_torch_state_dict

        sd = load_torch_state_dict(path)
        return {"params_g": convert_baseline(
            sd, self.config.base_configs.model_name)}
