"""Experiment logging backends.

Keeps the reference's metric-name schema (``train/L1``, ``val/PSNR``,
``model_loss/...``, ``indices_loss/...``, SURVEY.md §5.5) so existing
dashboards and compare scripts carry over.  Backends:

  * JSONL (always) — one line per log call, machine-readable.
  * TensorBoard — via ``torch.utils.tensorboard`` when importable
    (reference ``train.py:88-91``).
  * Weights & Biases — when the package is importable (reference
    ``train.py:84-86``); silently skipped otherwise (wandb is not in this
    image).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

__all__ = ["ExperimentLogger"]


class ExperimentLogger:
    def __init__(self, logdir: str, project: str = "nirgan_tpu",
                 use_tensorboard: bool = True, use_wandb: bool = True,
                 enabled: bool = True):
        """``enabled=False`` turns every log call into a no-op — multi-host
        trainers construct the real logger on process 0 only (the reference's
        PL loggers were likewise rank-zero)."""
        self.logdir = logdir
        self.enabled = enabled
        if not enabled:
            self._jsonl = self._tb = self._wandb = None
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a", buffering=1)

        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(logdir, "tb"))
            except Exception:
                self._tb = None

        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, dir=logdir)
            except Exception:
                self._wandb = None

    # ------------------------------------------------------------- scalars
    def log_metrics(self, metrics: dict, step: int):
        if not self.enabled:
            return
        clean = {k: float(np.asarray(v)) for k, v in metrics.items()}
        self._jsonl.write(json.dumps({"step": int(step), "time": time.time(),
                                      **clean}) + "\n")
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    # -------------------------------------------------------------- images
    def log_image(self, tag: str, pil_image, step: int):
        if not self.enabled:
            return
        path_dir = os.path.join(self.logdir, "images")
        os.makedirs(path_dir, exist_ok=True)
        safe = tag.replace("/", "_").replace(" ", "_")
        pil_image.save(os.path.join(path_dir, f"{safe}_{step:08d}.png"))
        if self._tb is not None:
            self._tb.add_image(tag, np.transpose(np.asarray(pil_image), (2, 0, 1)), step)
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Image(pil_image)}, step=step)

    def close(self):
        if not self.enabled:
            return
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
