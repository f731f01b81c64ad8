"""Optimizers and LR schedulers with torch-matching semantics.

- `torch_adam(lr, weight_decay)`: torch Adam couples weight decay into the
  gradient *before* the moment updates (unlike optax.adamw's decoupled
  decay) — the reference's classification factory uses
  `Adam(lr=1e-5, weight_decay=0.01)` (`classification/routine.py:271-275`).
- `torch_adamw()`: torch AdamW defaults (lr 1e-3, decoupled wd 0.01), the
  segmentation factory (`segmentation/routine.py:358`).
- `ReduceLROnPlateau` / `StepLR`: host-side controllers that scale the
  learning rate inside an `optax.inject_hyperparams` optimizer state, exactly
  replicating torch's plateau logic (mode/factor/patience/threshold).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax


def torch_adam(learning_rate: float = 1e-3, betas=(0.9, 0.999),
               eps: float = 1e-8, weight_decay: float = 0.0):
    """torch.optim.Adam parity (coupled L2 weight decay)."""

    @optax.inject_hyperparams
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)

    return make(learning_rate)


def torch_adamw(learning_rate: float = 1e-3, betas=(0.9, 0.999),
                eps: float = 1e-8, weight_decay: float = 1e-2):
    """torch.optim.AdamW parity (decoupled weight decay)."""

    @optax.inject_hyperparams
    def make(learning_rate):
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-learning_rate),
        )

    return make(learning_rate)


def _find_hyperparams(opt_state):
    """Locate the InjectHyperparamsState dict in a (possibly nested) state."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if isinstance(opt_state, tuple):
        for s in opt_state:
            found = _find_hyperparams(s)
            if found is not None:
                return found
    return None


def set_learning_rate_scale(opt_state, base_lr: float, scale: float):
    """Rewrite the injected learning_rate to base_lr * scale (host side)."""
    hp = _find_hyperparams(opt_state)
    if hp is None:
        raise ValueError("optimizer was not built with inject_hyperparams")
    hp["learning_rate"] = jnp.asarray(base_lr * scale,
                                      dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return opt_state


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau parity (mode='min',
    relative threshold)."""

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0):
        assert mode in ("min", "max")
        self.base_lr = base_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.scale = 1.0
        self.best = float("inf") if mode == "min" else -float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    @property
    def lr(self) -> float:
        return max(self.base_lr * self.scale, self.min_lr)

    def state_dict(self) -> dict:
        """Mutable plateau state, for checkpointing (torch parity)."""
        return {"scale": self.scale, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, d: dict):
        self.scale = float(d["scale"])
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d["cooldown_counter"])

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1 - self.threshold)
            return metric < self.best - self.threshold
        if self.threshold_mode == "rel":
            return metric > self.best * (1 + self.threshold)
        return metric > self.best + self.threshold

    def step(self, metric: float, opt_state: Any = None):
        """Update on a new metric value; optionally rewrite opt_state's lr.
        Returns the current lr."""
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.scale *= self.factor
                self.cooldown_counter = self.cooldown
                self.num_bad_epochs = 0
        if opt_state is not None:
            set_learning_rate_scale(opt_state, self.base_lr,
                                    max(self.scale, self.min_lr / self.base_lr
                                        if self.base_lr else 0.0))
        return self.lr


class StepLR:
    """torch.optim.lr_scheduler.StepLR parity."""

    def __init__(self, base_lr: float, step_size: int, gamma: float = 0.1):
        self.base_lr = base_lr
        self.step_size = step_size
        self.gamma = gamma
        self.epoch = 0

    @property
    def lr(self) -> float:
        return self.base_lr * self.gamma ** (self.epoch // self.step_size)

    def state_dict(self) -> dict:
        return {"epoch": self.epoch}

    def load_state_dict(self, d: dict):
        self.epoch = int(d["epoch"])

    def step(self, opt_state: Any = None):
        self.epoch += 1
        if opt_state is not None:
            set_learning_rate_scale(
                opt_state, self.base_lr,
                self.gamma ** (self.epoch // self.step_size))
        return self.lr
