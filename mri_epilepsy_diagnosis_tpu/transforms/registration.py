"""MNI registration and bias-field correction — jit'd replacements for the
reference's shell-outs to FSL C++ binaries.

The reference preprocesses detection volumes with FSL `FLIRT` (affine
registration to the MNI152 template, with `.mat` reuse to transform lesion
masks) and `FAST` (`output_biascorrected`) —
`detection/preprocessing_utils.py:11-73`.  Here:

- `register_affine`: multi-resolution gradient-descent optimization of a
  9/12-parameter affine on normalized cross-correlation, entirely on device
  (each level is one jit'd `lax.fori_loop`).  Returns the voxel->voxel matrix
  so the same transform can be re-applied to masks (`apply_transform`),
  mirroring FLIRT's `-applyxfm` workflow.
- `bias_field_correction`: FAST-equivalent multiplicative bias removal — a
  smooth polynomial fit to log-intensities over the foreground (N4-lite),
  solved with a single least-squares on device.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .augment import _poly_basis, _rotation_matrix
from .spatial import affine_resample


def params_to_affine(params, shape):
    """12-vector (tx,ty,tz, rx,ry,rz[rad], log-scales, shears) -> 4x4
    output-voxel -> input-voxel matrix about the volume center."""
    t = params[0:3]
    r = _rotation_matrix(params[3:6])
    s = jnp.exp(params[6:9])
    sh = params[9:12]
    shear = jnp.array([[1.0, sh[0], sh[1]],
                       [0.0, 1.0, sh[2]],
                       [0.0, 0.0, 1.0]])
    m = r @ shear * s[None, :]
    center = (jnp.asarray(shape, jnp.float32) - 1) / 2
    minv = jnp.linalg.inv(m)
    offset = center - minv @ (center + t)
    return jnp.eye(4).at[:3, :3].set(minv).at[:3, 3].set(offset)


def _ncc(a, b, eps=1e-8):
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    return jnp.sum(a * b) / jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b) + eps)


def _downsample(vol, factor: int):
    if factor == 1:
        return vol
    d, h, w = (s - s % factor for s in vol.shape)
    v = vol[:d, :h, :w]
    v = v.reshape(d // factor, factor, h // factor, factor, w // factor, factor)
    return v.mean(axis=(1, 3, 5))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _register_level(moving, fixed, params0, dof_mask, iters: int, lr: float):
    opt = optax.adam(lr)

    def loss_fn(p):
        aff = params_to_affine(p * dof_mask, moving.shape)
        warped = affine_resample(moving, aff, out_shape=fixed.shape)
        return -_ncc(warped, fixed)

    def body(_, carry):
        p, state = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, state = opt.update(g, state, p)
        return (optax.apply_updates(p, updates), state)

    p, _ = jax.lax.fori_loop(0, iters, body, (params0, opt.init(params0)))
    return p, loss_fn(p)


def register_affine(moving, fixed,
                    levels: Sequence[int] = (4, 2, 1),
                    iters: Sequence[int] = (200, 100, 50),
                    lr: float = 0.03,
                    dof: int = 12) -> Tuple[np.ndarray, jnp.ndarray]:
    """Affine-register `moving` (D,H,W) onto `fixed`'s grid.

    Returns (affine_voxel [4x4 fixed-voxel -> moving-voxel], warped volume).
    dof: 6 (rigid), 9 (+scales), 12 (+shears) — FLIRT's -dof options.
    """
    moving = jnp.asarray(moving, jnp.float32)
    fixed = jnp.asarray(fixed, jnp.float32)
    params = jnp.zeros((12,), jnp.float32)
    mask = np.zeros(12, np.float32)
    mask[:3] = mask[3:6] = 1
    if dof >= 9:
        mask[6:9] = 1
    if dof >= 12:
        mask[9:12] = 1
    mask = jnp.asarray(mask)

    for level, it in zip(levels, iters):
        mv = _downsample(moving, level)
        fx = _downsample(fixed, level)
        # translation parameters live in voxel units: rescale across levels
        scale_t = jnp.asarray([1 / level] * 3 + [1] * 9, jnp.float32)
        p_level = params * scale_t
        p_level, _ = _register_level(mv, fx, p_level, mask, int(it), lr)
        p_level = p_level * mask
        params = p_level / scale_t

    affine = params_to_affine(params, moving.shape)
    warped = affine_resample(moving, affine, out_shape=fixed.shape)
    return np.asarray(affine), warped


def apply_transform(vol, affine, out_shape, fill_value: float = 0.0):
    """Re-apply a registration transform (FLIRT `.mat`-reuse equivalent,
    used for lesion masks — `detection/preprocessing_utils.py:33-41`)."""
    return affine_resample(jnp.asarray(vol, jnp.float32), affine,
                           out_shape=out_shape, fill_value=fill_value)


@functools.partial(jax.jit, static_argnums=(1,))
def bias_field_correction(vol, order: int = 3, eps: float = 1e-6):
    """FAST-equivalent multiplicative bias removal (N4-lite).

    Fits a degree-`order` 3D polynomial to log-intensities over the
    foreground (x > mean) by least squares and divides it out, preserving
    the mean foreground intensity.  Returns (corrected, bias_field).
    """
    vol = jnp.asarray(vol, jnp.float32)
    basis = _poly_basis(vol.shape, order)            # (nb, D, H, W)
    nb = basis.shape[0]
    logx = jnp.log(jnp.maximum(vol, eps))
    w = (vol > jnp.mean(vol)).astype(jnp.float32)    # foreground weights

    a = basis.reshape(nb, -1)
    wf = w.reshape(-1)
    yf = logx.reshape(-1)
    hi = jax.lax.Precision.HIGHEST
    # weighted normal equations: (A W A^T) c = A W y
    awa = jnp.matmul(a * wf[None, :], a.T, precision=hi)
    awy = jnp.matmul(a * wf[None, :], yf, precision=hi)
    coeffs = jnp.linalg.solve(awa + 1e-6 * jnp.eye(nb), awy)
    log_bias = jnp.tensordot(coeffs, basis, axes=1, precision=hi)
    # remove the mean so correction is pure shading, not global scaling
    log_bias = log_bias - jnp.sum(log_bias * w) / jnp.maximum(jnp.sum(w), 1)
    bias = jnp.exp(log_bias)
    return vol / bias, bias
