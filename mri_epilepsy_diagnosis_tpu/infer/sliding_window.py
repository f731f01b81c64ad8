"""Batched sliding-window whole-volume inference.

Replaces the torchio GridSampler/GridAggregator pattern the reference uses
for patch-trained models (`pretraining_3d_unet.ipynb` cells 26/35: patch 64^3,
overlap 4, batch 16, argmax -> aggregate) with a jit-compiled pipeline:

- `grid_locations` computes the static patch grid (stride = patch - overlap,
  final patch clamped to the far edge — torchio semantics);
- patch extraction is a `lax.scan` of dynamic slices, model application is
  one batched call, aggregation averages overlaps ('average') or performs
  torchio's exact center-crop paste ('crop': crop overlap//2 per non-border
  face, overwrite in grid order — static-unrolled writes).

Everything is static-shaped, so the whole volume->labelmap path compiles to
a single XLA program and batches across volumes/devices (the continuous
whole-brain inference path of BASELINE.json).
"""
from __future__ import annotations

import functools
import itertools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_locations(size: int, patch: int, stride: int) -> np.ndarray:
    if size <= patch:
        return np.array([0])
    locs = list(range(0, size - patch + 1, stride))
    if locs[-1] != size - patch:
        locs.append(size - patch)
    return np.array(locs)


def grid_locations(spatial_shape: Sequence[int], patch_size, overlap=0
                   ) -> np.ndarray:
    """(P, 3) corner indices covering the volume (torchio GridSampler)."""
    patch = np.broadcast_to(np.asarray(patch_size), (3,))
    over = np.broadcast_to(np.asarray(overlap), (3,))
    strides = patch - over
    axes = [_axis_locations(s, p, st)
            for s, p, st in zip(spatial_shape, patch, strides)]
    return np.array(list(itertools.product(*axes)), np.int32)


def extract_patches(vol, locations, patch_size) -> jnp.ndarray:
    """vol (D,H,W,C), locations (P,3) -> (P, pd, ph, pw, C)."""
    patch = tuple(np.broadcast_to(np.asarray(patch_size), (3,)))

    def get(loc):
        return jax.lax.dynamic_slice(
            vol, (loc[0], loc[1], loc[2], 0), (*patch, vol.shape[-1]))

    return jax.vmap(get)(jnp.asarray(locations))


def make_sharded_apply(apply_fn: Callable, mesh) -> Callable:
    """Wrap a patch-batch `apply_fn(variables, patches)` so each model call
    inside `sliding_window_predict` runs data(+spatial)-parallel on `mesh`.

    Patch batches get a sharding constraint (batch over 'data', patch-D over
    'spatial' when that axis exists) so GSPMD partitions the conv work and
    inserts halo exchanges; extraction/aggregation scans stay replicated.
    Jit `sliding_window_predict` (or call it eagerly) with the wrapped fn —
    the torchio-GridSampler analog of multi-device batched inference.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    has_spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    spec = P("data", "spatial" if has_spatial else None)
    s = NamedSharding(mesh, spec)

    def wrapped(variables, patches):
        patches = jax.lax.with_sharding_constraint(patches, s)
        out = apply_fn(variables, patches)
        return jax.lax.with_sharding_constraint(out, s)

    return wrapped


def _coverage(spatial, locations, patch) -> np.ndarray:
    """Patches covering each voxel — a trace-time CONSTANT (the patch grid
    is static), so the 'average' normalization never costs device work."""
    cnt = np.zeros(tuple(spatial) + (1,), np.float32)
    for l0, l1, l2 in np.asarray(locations):
        cnt[l0:l0 + patch[0], l1:l1 + patch[1], l2:l2 + patch[2]] += 1.0
    return np.maximum(cnt, 1.0)


def _crop_boxes(spatial, locations, patch, overlap):
    """Static per-patch center-crop boxes, torchio GridAggregator
    `overlap_mode='crop'` semantics (`pretraining_3d_unet.ipynb` cells
    26/35 run this mode by default): every patch is cropped by
    ``overlap // 2`` on each face EXCEPT faces touching the volume border,
    which keep their margin; the cropped patch is pasted (overwritten, not
    averaged) in grid order.  Returns [(lead, stop, dst_lo, dst_hi)] per
    patch, all python ints — the paste unrolls to static-index writes."""
    half = np.broadcast_to(np.asarray(overlap), (3,)) // 2
    boxes = []
    for loc in np.asarray(locations):
        lead = [int(h) if int(l) > 0 else 0 for h, l in zip(half, loc)]
        trail = [int(h) if int(l) + int(p) < int(s) else 0
                 for h, l, p, s in zip(half, loc, patch, spatial)]
        stop = [int(p) - t for p, t in zip(patch, trail)]
        dst_lo = [int(l) + ld for l, ld in zip(loc, lead)]
        dst_hi = [int(l) + st for l, st in zip(loc, stop)]
        boxes.append((lead, stop, dst_lo, dst_hi))
    return boxes


@functools.partial(jax.jit,
                   static_argnames=("apply_fn", "patch_size", "overlap",
                                    "batch_size", "mode", "num_classes",
                                    "agg"))
def sliding_window_predict(apply_fn: Callable, variables, vol,
                           patch_size=64, overlap=4, batch_size: int = 64,
                           mode: str = "average", num_classes: int = 2,
                           agg: str = "unrolled"):
    """Whole-volume logits via overlapping patches.

    vol: (D,H,W,C).  Returns (D,H,W,num_classes) aggregated logits.
    `apply_fn(variables, patches)` maps (B, pd,ph,pw, C) -> (B, ..., classes).

    TPU defaults (batch-size-invariant numerics, A/B'd in
    experiments/sliding_window_batch_ab.py on the packed 192^3/64^3/
    overlap-4 grid): `batch_size=64` runs the whole grid in ONE model call
    instead of the reference GridSampler's 4 serialized batch-16 chunks,
    and `agg='unrolled'` exploits that the patch grid is STATIC twice —
    aggregation unrolls to static-index in-place adds, and the overlap
    normalization map is a trace-time numpy constant.  14.3 vol/s vs
    10.5 for a windowed `lax.scatter_add` ('scatter') or a read-modify-
    write `lax.scan` over the output buffer ('scan', the torchio
    GridAggregator translation) and 8.9 for scan at batch 16; the model
    itself costs 60 of the 70 ms/volume.  All three produce identical
    sums (tests/test_infer.py parity gate).
    """
    patch = tuple(np.broadcast_to(np.asarray(patch_size), (3,)))
    orig_spatial = vol.shape[:3]
    if any(s < p for s, p in zip(orig_spatial, patch)):
        # pad volumes smaller than the patch (torchio pads via CropOrPad)
        pads = [(0, max(0, p - s)) for s, p in zip(orig_spatial, patch)]
        vol = jnp.pad(vol, pads + [(0, 0)])
    spatial = vol.shape[:3]
    locations = grid_locations(spatial, patch_size, overlap)
    n = len(locations)

    patches = extract_patches(vol, locations, patch)
    # pad to a multiple of batch_size so every model call has a static shape
    # (capped at the grid size: a small grid must not pad UP to the batch)
    batch_size = min(batch_size, n)
    pad = (-n) % batch_size
    if pad:
        patches = jnp.concatenate(
            [patches, jnp.zeros((pad,) + patches.shape[1:], patches.dtype)])
    chunks = patches.reshape((-1, batch_size) + patches.shape[1:])
    if chunks.shape[0] == 1:
        logits = apply_fn(variables, chunks[0])[None]
    else:
        logits = jax.lax.map(lambda c: apply_fn(variables, c), chunks)
    logits = logits.reshape((-1,) + logits.shape[2:])[:n]

    if mode not in ("average", "crop"):
        raise ValueError(f"unknown aggregation mode {mode}")
    if agg not in ("scatter", "scan", "unrolled"):
        raise ValueError(f"unknown aggregation impl {agg}")

    out = jnp.zeros(spatial + (num_classes,), logits.dtype)

    if mode == "crop":
        # Exact torchio center-crop paste (see _crop_boxes).  Crop shapes
        # differ between border and interior patches, so this is inherently
        # the static-unrolled form — 'scatter'/'scan' can't express
        # ordered overwrites of varying windows and delegate here.
        for i, (lead, stop, lo, hi) in enumerate(
                _crop_boxes(spatial, locations, patch, overlap)):
            upd = logits[i][lead[0]:stop[0], lead[1]:stop[1],
                            lead[2]:stop[2]]
            out = out.at[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]].set(upd)
        return out[:orig_spatial[0], :orig_spatial[1], :orig_spatial[2]]

    norm = jnp.asarray(_coverage(spatial, locations, patch), logits.dtype)
    if agg == "scatter":
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3, 4), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1, 2))
        out = jax.lax.scatter_add(out, jnp.asarray(locations), logits, dn,
                                  indices_are_sorted=False,
                                  unique_indices=False)
    elif agg == "unrolled":
        # the patch grid is STATIC: unroll to static-index in-place adds
        # (XLA fuses them without the gather/scatter machinery)
        for i, (l0, l1, l2) in enumerate(np.asarray(locations)):
            out = out.at[l0:l0 + patch[0], l1:l1 + patch[1],
                         l2:l2 + patch[2]].add(logits[i])
    else:
        def body(out, xs):
            loc, lg = xs
            idx = (loc[0], loc[1], loc[2], 0)
            return jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, idx, lg.shape) + lg, idx), None

        out, _ = jax.lax.scan(body, out, (jnp.asarray(locations), logits))

    out = out / norm
    return out[:orig_spatial[0], :orig_spatial[1], :orig_spatial[2]]


class GridSampler:
    """torchio-compatible sampler facade over `grid_locations`."""

    def __init__(self, volume, patch_size=64, patch_overlap=4):
        self.volume = volume
        self.patch_size = patch_size
        self.patch_overlap = patch_overlap
        self.locations = grid_locations(volume.shape[:3], patch_size,
                                        patch_overlap)

    def __len__(self):
        return len(self.locations)

    def patches(self):
        return extract_patches(self.volume, self.locations, self.patch_size)


class GridAggregator:
    """torchio-compatible aggregator: add_batch(labels, locations) then
    get_output_tensor().  Host-side numpy.  `overlap_mode='average'`
    (default) averages overlapping contributions; `'crop'` reproduces
    torchio's center-crop paste exactly (crop ``patch_overlap // 2`` per
    non-border face, overwrite in batch order — see `_crop_boxes`)."""

    def __init__(self, spatial_shape, num_classes: int = 1,
                 overlap_mode: str = "average", patch_overlap=None):
        if overlap_mode not in ("average", "crop"):
            raise ValueError(f"unknown overlap_mode {overlap_mode}")
        if overlap_mode == "crop" and not np.any(patch_overlap):
            # torchio's aggregator receives the overlap from its sampler; an
            # unset/zero overlap here would silently degrade 'crop' to
            # full-patch overwrite-in-order (ADVICE r4) — require it.
            raise ValueError(
                "overlap_mode='crop' needs the sampler's patch_overlap "
                "(e.g. GridAggregator(..., patch_overlap=sampler."
                "patch_overlap)); got "
                f"{patch_overlap!r}")
        if patch_overlap is None:
            patch_overlap = 0
        self.spatial = tuple(spatial_shape)
        self.overlap_mode = overlap_mode
        self.patch_overlap = patch_overlap
        self.acc = np.zeros(self.spatial + (num_classes,), np.float64)
        self.cnt = np.zeros(self.spatial + (1,), np.float64)

    def add_batch(self, values, locations):
        values = np.asarray(values)
        if values.ndim == 4:  # (B, pd, ph, pw) labels
            values = values[..., None]
        locations = np.asarray(locations)
        if self.overlap_mode == "crop":
            boxes = _crop_boxes(self.spatial, locations, values.shape[1:4],
                                self.patch_overlap)
            for v, (lead, stop, lo, hi) in zip(values, boxes):
                dst = tuple(slice(a, b) for a, b in zip(lo, hi))
                self.acc[dst] = v[lead[0]:stop[0], lead[1]:stop[1],
                                  lead[2]:stop[2]]
                self.cnt[dst] = 1
            return
        for v, loc in zip(values, locations):
            sl = tuple(slice(l, l + s) for l, s in zip(loc, v.shape[:3]))
            self.acc[sl] += v
            self.cnt[sl] += 1

    def get_output_tensor(self):
        return self.acc / np.maximum(self.cnt, 1)
