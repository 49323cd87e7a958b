"""Optimizers and schedules.

adam(): optax chain reproducing torch.optim.Adam semantics — L2 weight decay
is COUPLED (added to the gradient before the moment updates, unlike adamw),
eps outside the sqrt — matching the reference drivers
(test_lipo.py:139 Adam(lr=1e-2, weight_decay=1e-4), test.py:97 plain Adam).

ReduceLROnPlateau: host-side controller matching torch defaults
(factor=0.1, patience=10, rel threshold=1e-4, mode='min'), feeding the
learning rate through optax.inject_hyperparams (test_lipo.py:140,152).
"""

from __future__ import annotations

import optax


def adam(learning_rate: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8, weight_decay: float = 0.0):
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)
    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau default semantics."""

    def __init__(self, lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1 - self.threshold)
            return metric < self.best - self.threshold
        if self.threshold_mode == "rel":
            return metric > self.best * (1 + self.threshold)
        return metric > self.best + self.threshold

    def step(self, metric: float) -> float:
        """Record an epoch metric; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.lr

    def state_dict(self):
        return {k: getattr(self, k) for k in
                ("lr", "best", "num_bad", "cooldown_counter")}

    def load_state_dict(self, d):
        for k, v in d.items():
            setattr(self, k, v)
