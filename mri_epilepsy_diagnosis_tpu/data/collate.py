"""Collate functions.

`fader_collate(landmarks)` reproduces the reference's `default_collate`
(`train_ENC_CLF.ipynb` cells 9-10): per-sample Nyul histogram standardization
with the trained 13-landmark mapping applied at batch-assembly time, plus
int labels/domains — but standardization runs as part of the device graph
(jit) rather than a CPU worker.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..transforms.intensity import histogram_standardization


def fader_collate(landmarks):
    landmarks = np.asarray(landmarks, np.float32)

    @jax.jit
    def _standardize_batch(x):
        return jax.vmap(lambda v: histogram_standardization(v, landmarks))(x)

    def collate(batch):
        vols = np.stack([np.moveaxis(np.asarray(item[0]), 0, -1)
                         for item in batch])
        x = _standardize_batch(jnp.asarray(vols))
        y = np.asarray([item[1] for item in batch], np.int32)
        dom = np.asarray([item[2] for item in batch], np.int32)
        return x, y, dom

    return collate
