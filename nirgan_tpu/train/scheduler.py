"""ReduceLROnPlateau with torch-default semantics.

The reference wires only ``patience`` through to torch's scheduler and
(quirk, preserved deliberately) leaves ``factor`` at the torch default 0.1
even though the configs carry ``Schedulers.factor_*`` (SURVEY.md §5.6;
``model/pix2pix.py:488-489``).  ``Trainer`` reproduces exactly that wiring.

This is host-side state: it rewrites the live ``lr_g``/``lr_d`` scalars in
the TrainState between steps, so no recompilation ever happens.
"""

from __future__ import annotations

__all__ = ["ReduceLROnPlateau", "get_scheduler"]


class ReduceLROnPlateau:
    def __init__(self, mode: str = "min", factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, threshold_mode: str = "rel",
                 cooldown: int = 0, min_lr: float = 0.0):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.mode, self.factor, self.patience = mode, factor, patience
        self.threshold, self.threshold_mode = threshold, threshold_mode
        self.cooldown, self.min_lr = cooldown, min_lr
        self.best = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            bar = (self.best * (1.0 - self.threshold)
                   if self.threshold_mode == "rel" else self.best - self.threshold)
            return current < bar
        bar = (self.best * (1.0 + self.threshold)
               if self.threshold_mode == "rel" else self.best + self.threshold)
        return current > bar

    def step(self, metric: float, lr: float) -> float:
        """Record an epoch metric; return the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            self.cooldown_counter = self.cooldown
            return max(lr * self.factor, self.min_lr)
        return lr


def get_scheduler(lr_policy: str, base_lr: float, *, n_epochs: int = 100,
                  n_epochs_decay: int = 100, epoch_count: int = 1,
                  lr_decay_iters: int = 50, plateau_patience: int = 5):
    """Epoch-indexed LR policy dispatch mirroring the reference's
    ``get_scheduler`` (``model/networks.py:39-65``): linear | step | plateau
    | cosine.

    Returns ``schedule(epoch [, metric]) -> lr`` — a plain callable the
    trainer multiplies into the live LR scalars (plateau returns a stateful
    object with the same call signature).
    """
    import math

    if lr_policy == "linear":
        def schedule(epoch, metric=None):
            factor = 1.0 - max(0, epoch + epoch_count - n_epochs) / float(n_epochs_decay + 1)
            return base_lr * factor

        return schedule
    if lr_policy == "step":
        def schedule(epoch, metric=None):
            return base_lr * (0.1 ** (epoch // lr_decay_iters))

        return schedule
    if lr_policy == "cosine":
        def schedule(epoch, metric=None):
            return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / n_epochs))

        return schedule
    if lr_policy == "plateau":
        # torch-in-reference wiring: mode='min', factor=0.2, threshold=0.01
        plateau = ReduceLROnPlateau(mode="min", factor=0.2, threshold=0.01,
                                    patience=plateau_patience)
        current = {"lr": base_lr}

        def schedule(epoch, metric=None):
            if metric is not None:
                current["lr"] = plateau.step(metric, current["lr"])
            return current["lr"]

        return schedule
    raise NotImplementedError(f"learning rate policy [{lr_policy}] is not implemented")
