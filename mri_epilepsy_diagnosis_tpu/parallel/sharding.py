"""Parallelism via jax.sharding: data parallelism + spatial (volume)
partitioning.

The reference's only multi-device code is a manual 2-stage encoder/decoder
split with explicit `.to(device)` transfers (`3d_bayes_unet.py:45-66`) and no
communication backend at all (SURVEY.md §2.3).  The TPU-native design
replaces all of it with sharding annotations on one jitted program:

- **data axis**: batch dim sharded; gradient all-reduce is inserted by XLA
  (psum over ICI) when the loss reduces over the batch.
- **spatial axis**: the D spatial dim of volumes sharded; XLA GSPMD inserts
  the halo exchanges convolutions need automatically.  This is the
  volume-size analog of sequence parallelism (torchio's patch pipeline being
  the reference's workaround, `segmentation/routine.py:150-178`).

`halo_exchange` is also provided explicitly (ppermute under shard_map) for
custom kernels that manage their own halos (e.g. Pallas conv kernels).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis))


def volume_sharding(mesh: Mesh, data_axis: Optional[str] = "data",
                    spatial_axis: Optional[str] = "spatial") -> NamedSharding:
    """(N, D, H, W, C): batch over data axis, D over spatial axis."""
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def check_shard_divisibility(shape, mesh: Mesh, data_axis: Optional[str],
                             spatial_axis: Optional[str] = None):
    """Fail fast (clear message) when an array can't shard evenly.

    GSPMD tolerates uneven shards by silent padding, which wastes a full
    padded block of FLOPs per device and changes batch statistics; the
    framework instead requires batch % data-axis == 0 and (for volume
    sharding) D % spatial-axis == 0 — same contract as the UNet's own
    /2^k divisibility rule.
    """
    if data_axis in mesh.axis_names:
        n = mesh.shape[data_axis]
        if n > 1 and shape[0] % n:
            raise ValueError(
                f"batch dim {shape[0]} not divisible by mesh '{data_axis}' "
                f"axis size {n}: pad or rebatch the input (uneven shards "
                f"would be silently zero-padded per device)")
    if spatial_axis and spatial_axis in mesh.axis_names:
        n = mesh.shape[spatial_axis]
        if n > 1 and len(shape) > 1 and shape[1] % n:
            raise ValueError(
                f"spatial dim D={shape[1]} not divisible by mesh "
                f"'{spatial_axis}' axis size {n}: crop/pad the volume so "
                f"every device holds an equal D slab")


def shard_batch(batch, mesh: Mesh, sharding: Optional[NamedSharding] = None):
    """device_put a batch pytree with its dim-0 sharded over 'data'."""
    s = sharding or batch_sharding(mesh)

    def put(x):
        x = jnp.asarray(x)
        if sharding is None:
            check_shard_divisibility(x.shape, mesh, "data")
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def make_parallel_apply(apply_fn, mesh: Mesh, in_volume_sharding=True):
    """jit `apply_fn(variables, x)` with variables replicated and x sharded
    (batch over 'data', and D over 'spatial' if the mesh has that axis)."""
    has_spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    x_shard = (volume_sharding(mesh, "data", "spatial" if has_spatial else None)
               if in_volume_sharding else batch_sharding(mesh))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(apply_fn, in_shardings=(rep, x_shard),
                     out_shardings=x_shard)

    @functools.wraps(apply_fn)
    def checked(variables, x):
        check_shard_divisibility(
            x.shape, mesh, "data",
            "spatial" if (in_volume_sharding and has_spatial) else None)
        return jitted(variables, x)

    return checked


def halo_exchange(x, axis_name: str, halo: int, dim: int = 1):
    """Append `halo` boundary slices from both mesh neighbors along `dim`.

    Must run inside shard_map over `axis_name`.  Edge shards get zero halos
    (same as conv zero padding).  Returns x extended by 2*halo along dim.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(x, start, size):
        sl = [slice(None)] * x.ndim
        sl[dim] = slice(start, start + size) if start >= 0 else slice(start, None)
        return x[tuple(sl)]

    # slice I send to my right neighbor: my last `halo` planes
    right_send = take(x, -halo, halo)
    left_send = take(x, 0, halo)
    # ppermute: receive from left neighbor the slice it sent right
    from_left = jax.lax.ppermute(right_send, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_send, axis_name,
                                  [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=dim)
