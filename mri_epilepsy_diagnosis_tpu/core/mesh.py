"""Device mesh construction and canonical shardings.

The reference has no distributed runtime at all (SURVEY.md §2.3 — single GPU,
the only multi-device code is a manual 2-stage encoder/decoder split,
`segmentation/models/3d_bayes_unet.py:45-66`).  The TPU-native design scales
through a `jax.sharding.Mesh` instead:

- axis ``data``    — batch (data parallelism; grad all-reduce rides ICI)
- axis ``spatial`` — D-axis spatial partitioning of whole volumes with halo
                     exchange (the volume-size analog of sequence parallelism)

Meshes are cheap to construct; every train/infer entry point takes an optional
mesh and defaults to all local devices on the ``data`` axis.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return len(jax.devices())


def enable_compilation_cache(path: str = "/tmp/mri_tpu_jax_cache",
                             min_compile_secs: float = 1.0):
    """Persistent executable cache — remote TPU compiles on this platform
    cost minutes, cached reloads ~1s. Call before the first jit."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Sequence[int] | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over `devices` (default: all).

    If ``axis_sizes`` is None, all devices go to the first axis and the rest
    get size 1.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if math.prod(axis_sizes) != n:
        raise ValueError(
            f"axis_sizes {tuple(axis_sizes)} do not multiply to #devices {n}"
        )
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: first array dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
