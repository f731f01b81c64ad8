"""Random augmentations — explicit-key jittable transforms.

Functional equivalents of the torchio transforms the reference composes in
`segmentation/baseline_3d_unet.ipynb` cell 8 (RandomFlip, RandomAffine,
RandomElasticDeformation, RandomNoise, RandomMotion, RandomBiasField).
Every transform has signature `fn(key, vol) -> vol` over a (D,H,W) volume
(vmap over batch/channels at the call site), so a whole augmentation chain
jit-compiles into a single fused XLA program — there is no host-side
worker-pool preprocessing stage (the reference needs
`num_workers=cpu_count()` to hide torchio cost; here the TPU does it).

`Compose`/`OneOf` mirror torchio's composition API.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spatial import affine_resample, trilinear_sample, warp_dense, _output_grid


def random_flip(key, vol, axes: Sequence[int] = (0,), flip_probability: float = 0.5):
    """torchio RandomFlip: flip each listed axis with probability p."""
    keys = jax.random.split(key, len(axes))
    for ax, k in zip(axes, keys):
        do = jax.random.bernoulli(k, flip_probability)
        vol = jnp.where(do, jnp.flip(vol, axis=ax), vol)
    return vol


def random_noise(key, vol, mean: float = 0.0, std: Tuple[float, float] = (0.0, 0.25)):
    """torchio RandomNoise: additive gaussian noise, std ~ U(std_range)."""
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (), minval=std[0], maxval=std[1])
    return vol + mean + s * jax.random.normal(k2, vol.shape, vol.dtype)


def _poly_basis(shape, order: int):
    """Polynomial basis functions over the volume, coords in [-1, 1]."""
    coords = [jnp.linspace(-1.0, 1.0, s) for s in shape]
    g = jnp.meshgrid(*coords, indexing="ij")
    basis = []
    for i in range(order + 1):
        for j in range(order + 1 - i):
            for k in range(order + 1 - i - j):
                basis.append(g[0] ** i * g[1] ** j * g[2] ** k)
    return jnp.stack(basis)  # (n_coeff, D, H, W)


def random_bias_field(key, vol, coefficients: float = 0.5, order: int = 3):
    """torchio RandomBiasField: multiply by exp(polynomial field)."""
    basis = _poly_basis(vol.shape, order)
    coeffs = jax.random.uniform(key, (basis.shape[0],),
                                minval=-coefficients, maxval=coefficients)
    field = jnp.exp(jnp.tensordot(coeffs, basis, axes=1))
    return vol * field


def _rotation_matrix(angles_rad):
    ax, ay, az = angles_rad
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def random_affine(key, vol, scales: Tuple[float, float] = (0.9, 1.1),
                  degrees: float = 10.0, translation: float = 0.0,
                  fill_value: float = 0.0):
    """torchio RandomAffine: random scale/rotation/translation about the
    volume center, trilinear resampling."""
    k1, k2, k3 = jax.random.split(key, 3)
    sc = jax.random.uniform(k1, (3,), minval=scales[0], maxval=scales[1])
    ang = jax.random.uniform(k2, (3,), minval=-degrees, maxval=degrees)
    tr = jax.random.uniform(k3, (3,), minval=-translation, maxval=translation)
    r = _rotation_matrix(jnp.deg2rad(ang)) * sc[None, :]
    center = (jnp.asarray(vol.shape, jnp.float32) - 1) / 2
    # output voxel -> input voxel: inverse transform about the center
    rinv = jnp.linalg.inv(r)
    offset = center - rinv @ (center + tr)
    affine = jnp.eye(4).at[:3, :3].set(rinv).at[:3, 3].set(offset)
    return affine_resample(vol, affine, fill_value=fill_value)


def random_elastic_deformation(key, vol, num_control_points: int = 7,
                               max_displacement: float = 7.5,
                               fill_value: float = 0.0):
    """torchio RandomElasticDeformation: random coarse control-grid
    displacements upsampled to a dense field (trilinear B-spline-lite)."""
    cp = jax.random.uniform(
        key, (3, num_control_points, num_control_points, num_control_points),
        minval=-max_displacement, maxval=max_displacement)
    # upsample control grid to dense displacement field (separable linear)
    from ..ops.functional import resize_linear
    field = resize_linear(jnp.moveaxis(cp, 0, -1)[None], vol.shape,
                          align_corners=True)[0]
    return warp_dense(vol, jnp.moveaxis(field, -1, 0), fill_value)


def random_motion(key, vol, degrees: float = 10.0, translation: float = 10.0,
                  num_transforms: int = 2):
    """Simplified torchio RandomMotion: average the volume with a few
    rigidly displaced copies (ghosting-style artifact).  The reference's
    k-space interleaving is approximated in image space — the augmentation
    intent (motion-corrupted training volumes) is preserved."""
    keys = jax.random.split(key, num_transforms)
    acc = vol
    for k in keys:
        acc = acc + random_affine(k, vol, scales=(1.0, 1.0), degrees=degrees,
                                  translation=translation)
    return acc / (num_transforms + 1)


class Compose:
    """torchio-style Compose over `fn(key, vol)` transforms."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, key, vol):
        keys = jax.random.split(key, max(len(self.transforms), 1))
        for fn, k in zip(self.transforms, keys):
            vol = fn(k, vol)
        return vol


class OneOf:
    """torchio OneOf: apply one transform chosen at random (equal weights)."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, key, vol):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, len(self.transforms))
        branches = [lambda v, fn=fn, k=k2: fn(k, v) for fn in self.transforms]
        return jax.lax.switch(idx, branches, vol)
