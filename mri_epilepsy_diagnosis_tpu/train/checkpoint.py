"""Checkpoint save/restore.

Unlike the reference (bare `torch.save(model.state_dict())`, optimizer state
never saved — SURVEY.md §5), checkpoints here capture params, batch stats,
optimizer state and step, so training resumes exactly.  Serialization is
flax msgpack (single file, no directory layout requirements); `.pth` import
lives in `interop/`.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import flax.serialization
import jax

from .state import TrainState


def save_checkpoint(path: str, state: TrainState, **extra):
    payload: Dict[str, Any] = {
        "step": int(state.step),
        "params": flax.serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": flax.serialization.to_state_dict(
            jax.device_get(state.batch_stats)),
        "opt_state": flax.serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "extra": extra,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))


def load_checkpoint_extra(path: str) -> Dict[str, Any]:
    """The **extra payload saved alongside a checkpoint (e.g. scheduler
    state); {} if none."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return payload.get("extra") or {}


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an existing (template) state; shapes must match."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return state.replace(
        step=int(payload["step"]),
        params=flax.serialization.from_state_dict(state.params,
                                                  payload["params"]),
        batch_stats=flax.serialization.from_state_dict(state.batch_stats,
                                                       payload["batch_stats"]),
        opt_state=flax.serialization.from_state_dict(state.opt_state,
                                                     payload["opt_state"]),
    )
