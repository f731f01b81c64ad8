"""Spatial transforms: dense warps and affine resampling, jittable.

`affine_resample` is the FLIRT-equivalent applicator: given a voxel->voxel
affine (e.g. from `transforms.registration` or a FLIRT `.mat` converted to
voxel space) it resamples a volume onto a target grid with trilinear
interpolation — replacing the reference's shell-out to FSL `flirt -applyxfm`
(`detection/preprocessing_utils.py:33-41`).

Implementation is gather-based: 8 corner gathers + trilinear blend.  XLA
lowers the gathers to efficient dynamic-slice trees on TPU; for the hot
whole-pipeline path the separable matmul resize in `ops.functional` is used
instead whenever the transform is axis-aligned.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.functional import crop_or_pad as _crop_or_pad_op


def crop_or_pad(x, target_spatial, value=0.0):
    """torchio CropOrPad on a bare volume (D,H,W) or (C,D,H,W)."""
    if x.ndim == 3:
        return _crop_or_pad_op(x[None, ..., None], target_spatial,
                               value=value)[0, ..., 0]
    if x.ndim == 4:  # (C,D,H,W)
        y = _crop_or_pad_op(jnp.moveaxis(x, 0, -1)[None], target_spatial,
                            value=value)
        return jnp.moveaxis(y[0], -1, 0)
    return _crop_or_pad_op(x, target_spatial, value=value)


def flip(x, axes: Sequence[int]):
    """Flip spatial axes of a (D,H,W) volume."""
    return jnp.flip(x, axis=tuple(axes))


def trilinear_sample(vol, coords, fill_value: float = 0.0):
    """Sample (D,H,W) `vol` at float `coords` (3, ...) with trilinear
    interpolation; out-of-bounds reads return `fill_value`."""
    d, h, w = vol.shape
    cd, ch, cw = coords[0], coords[1], coords[2]

    d0 = jnp.floor(cd).astype(jnp.int32)
    h0 = jnp.floor(ch).astype(jnp.int32)
    w0 = jnp.floor(cw).astype(jnp.int32)
    td, th, tw = cd - d0, ch - h0, cw - w0

    valid = ((cd >= 0) & (cd <= d - 1) & (ch >= 0) & (ch <= h - 1)
             & (cw >= 0) & (cw <= w - 1))

    def gather(dd, hh, ww):
        dd = jnp.clip(dd, 0, d - 1)
        hh = jnp.clip(hh, 0, h - 1)
        ww = jnp.clip(ww, 0, w - 1)
        return vol[dd, hh, ww]

    out = jnp.zeros_like(td, dtype=vol.dtype)
    for bd in (0, 1):
        for bh in (0, 1):
            for bw in (0, 1):
                wgt = ((td if bd else 1 - td)
                       * (th if bh else 1 - th)
                       * (tw if bw else 1 - tw))
                out = out + wgt * gather(d0 + bd, h0 + bh, w0 + bw)
    return jnp.where(valid, out, fill_value)


def _output_grid(shape):
    return jnp.stack(jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in shape], indexing="ij"))


def affine_resample(vol, affine_vox, out_shape=None, fill_value: float = 0.0):
    """Resample (D,H,W) `vol` onto `out_shape` through a 4x4 voxel->voxel
    affine mapping *output* voxel coords to *input* voxel coords."""
    if out_shape is None:
        out_shape = vol.shape
    grid = _output_grid(out_shape)                       # (3, D,H,W)
    g = grid.reshape(3, -1)
    a = jnp.asarray(affine_vox, jnp.float32)
    src = jnp.matmul(a[:3, :3], g, precision=jax.lax.Precision.HIGHEST) + a[:3, 3:4]
    src = src.reshape((3,) + tuple(out_shape))
    return trilinear_sample(vol, src, fill_value)


def warp_dense(vol, displacement, fill_value: float = 0.0):
    """Warp (D,H,W) `vol` by a dense displacement field (3,D,H,W) given in
    voxels: out[p] = vol[p + disp[p]] (backward warp)."""
    grid = _output_grid(vol.shape)
    return trilinear_sample(vol, grid + displacement, fill_value)


def world_affine_to_voxel(src_affine: np.ndarray, dst_affine: np.ndarray,
                          world_transform: np.ndarray | None = None) -> np.ndarray:
    """Compose NIfTI affines into the voxel->voxel matrix `affine_resample`
    expects (dst voxel -> src voxel):  inv(src) @ inv(world) @ dst."""
    wt = np.eye(4) if world_transform is None else np.asarray(world_transform)
    return np.linalg.inv(np.asarray(src_affine)) @ np.linalg.inv(wt) @ np.asarray(dst_affine)
