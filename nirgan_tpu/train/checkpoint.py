"""Checkpoint management (orbax).

Reproduces the reference's three mechanisms (SURVEY.md §5.4):
  1. monitored best + last saving (PL ``ModelCheckpoint(monitor='val/L1',
     mode='min', save_last=True, save_top_k=1)``, ``train.py:99-103``),
  2. weights-only warm start with partial-restore (strict=False) semantics
     (``train.py:61-65``) — including from *torch* reference checkpoints via
     ``torch_convert``,
  3. full resume of params + both optimizers + step + LRs
     (``Trainer(resume_from_checkpoint=…)``, ``train.py:126``).

Orbax writes are atomic, which also covers TPU-preemption recovery
(SURVEY.md §5.3: the reference has no failure handling at all).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "merge_params"]


def merge_params(target, loaded):
    """strict=False state-dict semantics: graft every leaf of ``loaded``
    whose path+shape matches into ``target``; ignore the rest."""
    if not isinstance(loaded, dict):
        return target
    out = dict(target)
    for k, v in loaded.items():
        if k not in out:
            continue
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_params(out[k], v)
        else:
            tgt = out[k]
            if hasattr(tgt, "shape") and tuple(np.shape(v)) == tuple(tgt.shape):
                out[k] = np.asarray(v, dtype=np.asarray(tgt).dtype if hasattr(tgt, "dtype") else None)
    return out


class CheckpointManager:
    """best/last checkpointing over a TrainState pytree."""

    def __init__(self, directory: str, monitor: str = "val/L1", mode: str = "min",
                 save_last: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor, self.mode, self.save_last = monitor, mode, save_last
        self.best_metric: Optional[float] = None
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.directory, "ckpt_meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.best_metric = json.load(f).get("best_metric")

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state, metrics: dict) -> bool:
        """Save ``last`` (always, if enabled) and ``best`` on improvement of
        the monitored metric.  Returns True if this was a new best."""
        value = metrics.get(self.monitor)
        improved = False
        if value is not None:
            value = float(value)
            if (self.best_metric is None
                    or (self.mode == "min" and value < self.best_metric)
                    or (self.mode == "max" and value > self.best_metric)):
                self.best_metric = value
                self._ckptr.save(self._path("best"), state, force=True)
                improved = True
        if self.save_last:
            self._ckptr.save(self._path("last"), state, force=True)
        if jax.process_index() == 0:
            # multi-process saves: every process calls save() (orbax
            # coordinates the sharded write); only one writes the meta file
            with open(self._meta_path, "w") as f:
                json.dump({"best_metric": self.best_metric,
                           "step": int(jax.device_get(state.step))}, f)
        self._ckptr.wait_until_finished()
        return improved

    def restore(self, state_template, which: str = "last"):
        """Full resume: returns a TrainState matching the template's
        structure/shardings, or None if absent."""
        path = self._path(which)
        if not os.path.isdir(path):
            return None
        return self._ckptr.restore(path, target=state_template)

    def has(self, which: str = "last") -> bool:
        return os.path.isdir(self._path(which))
