"""Deterministic seeding and RNG threading.

Replaces the reference's global seeding idiom (`torch.manual_seed(0)`,
`np.random.seed(0)`, cudnn-deterministic flags —
`classification/routine.py:256-259`, `segmentation/routine.py:341-344`) with
explicit, splittable JAX keys.  XLA compilation is deterministic by
construction, so a seed alone reproduces a run.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np


def seed_everything(seed: int = 0) -> jax.Array:
    """Seed numpy's legacy global RNG (for host-side shuffles that mirror the
    reference's `np.random.seed(0)`) and return a root JAX key."""
    np.random.seed(seed)
    return jax.random.key(seed)


@dataclasses.dataclass
class RngStream:
    """A mutable convenience wrapper that hands out fresh subkeys.

    Host-side only (do not use inside jit; pass explicit keys there).
    """

    key: jax.Array

    @classmethod
    def from_seed(cls, seed: int) -> "RngStream":
        return cls(jax.random.key(seed))

    def next(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def next_n(self, n: int):
        self.key, *subs = jax.random.split(self.key, n + 1)
        return subs
