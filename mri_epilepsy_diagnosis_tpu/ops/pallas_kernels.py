"""Pallas TPU kernels for the framework's hot ops.

First kernel: the **separable one-axis conv** — the fader family applies
every conv as (k,1,1)/(1,k,1)/(1,1,k) factors (`models/fader.py`, reference
`classification/models/AE_model.py`).  A one-axis conv over channels-last
volumes is reformulated as an in-VMEM im2col + single MXU matmul:

    y[m, j, co] = sum_{t, ci} x[m, j*s + t, ci] * w[t, ci, co]

with m = collapsed (N*D*H) rows tiled over the grid, the conv axis and
channels resident in VMEM, and the k shifted views concatenated so the MXU
sees one (TILE_M * W_out, k*Ci) @ (k*Ci, Co) contraction — k*Ci lands near
the 128-wide MXU K dimension where thin-channel convs otherwise waste it.

`separable_conv3d` applies the kernel along each spatial axis in turn
(moveaxis between calls), with the XLA conv as fallback for shapes that
don't fit VMEM and for non-TPU backends (tests run `interpret=True`).

Status on this image's Mosaic toolchain (kept opt-in until resolved):
compiled kernels with ONE or TWO shifted-window dots compile and run, but
three overlapping-window dots in one kernel, any minor-dim concatenation of
thin-channel (<128 lane) arrays, and in-kernel `lax.dynamic_slice` all crash
or are unimplemented in the remote `tpu_compile_helper`.  The interpret-mode
path is numerically verified in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_axis_kernel(x_ref, w_ref, out_ref, *, k, stride, pad, w_in, w_out):
    x = x_ref[...]                    # (TILE_M, W, Ci)
    tile_m, _, ci = x.shape
    if pad:
        zeros = jnp.zeros((tile_m, pad, ci), x.dtype)
        x = jnp.concatenate([zeros, x, zeros], axis=1)
    # k shifted views along the conv axis, one dot per tap, summed.  (The
    # earlier minor-dim im2col concat — one (TILE_M*W_out, k*Ci) dot —
    # crashes this toolchain's Mosaic for thin channels: "result/input
    # offset mismatch on non-concat dimension".  Per-tap dots keep the
    # kernel inside the known-good envelope; cap dots with
    # `conv_axis_last(max_taps=...)`.)  Strided views go through a
    # (W/s, s) reshape + parity index instead of a strided slice (Mosaic
    # supports only 2D gathers).
    if stride == 1:
        views = [x[:, t:t + w_out, :] for t in range(k)]
    else:
        need = stride * (w_out + (k - 1) // stride + 1)
        if x.shape[1] < need:
            x = jnp.concatenate(
                [x, jnp.zeros((tile_m, need - x.shape[1], ci), x.dtype)],
                axis=1)
        xr = x.reshape(tile_m, x.shape[1] // stride, stride, ci)
        views = [xr[:, t // stride:t // stride + w_out, t % stride, :]
                 for t in range(k)]
    y = None
    for t in range(k):
        part = jnp.dot(views[t].reshape(tile_m * w_out, ci), w_ref[t],
                       preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    out_ref[...] = y.reshape(tile_m, w_out, -1).astype(out_ref.dtype)


def conv_axis_last(x2, w, *, stride: int = 1, pad: int = 0,
                   tile_m: int = 256, interpret: bool = False,
                   max_taps: int = 0):
    """Conv along axis -2 of x2: (M, W, Ci) with w (k, Ci, Co).

    Returns (M, W_out, Co).  M is padded to a tile multiple internally.

    `max_taps > 0` splits the k taps into chunks of that many per
    `pallas_call`, summing the partial outputs in XLA — the compiled-path
    workaround for this toolchain's Mosaic, which crashes on kernels with
    >= 3 overlapping-window dots (see module docstring): `max_taps=2` turns
    the fader k=6 conv into three compiled two-dot kernels.
    """
    m, w_in, ci = x2.shape
    k, ci2, co = w.shape
    assert ci == ci2, (ci, ci2)
    w_out = (w_in + 2 * pad - k) // stride + 1

    if max_taps and k > max_taps:
        # y[j] = sum_t xp[j*s + t] w[t]: each tap chunk is a VALID conv of
        # the padded input shifted by the chunk's first tap
        xp = x2
        if pad:
            xp = jnp.concatenate(
                [jnp.zeros((m, pad, ci), x2.dtype), x2,
                 jnp.zeros((m, pad, ci), x2.dtype)], axis=1)
        total = None
        for t0 in range(0, k, max_taps):
            kk = min(max_taps, k - t0)
            need = (w_out - 1) * stride + kk
            part = conv_axis_last(xp[:, t0:t0 + need, :], w[t0:t0 + kk],
                                  stride=stride, pad=0, tile_m=tile_m,
                                  interpret=interpret)
            total = part if total is None else total + part
        return total

    tile_m = min(tile_m, max(8, m))
    m_pad = (-m) % tile_m
    if m_pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((m_pad, w_in, ci), x2.dtype)], axis=0)
    grid = (x2.shape[0] // tile_m,)

    out = pl.pallas_call(
        functools.partial(_conv_axis_kernel, k=k, stride=stride, pad=pad,
                          w_in=w_in, w_out=w_out),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], w_out, co), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, w_in, ci), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, w_out, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, w)
    return out[:m]


def conv_one_axis(x, w, axis: int, *, stride: int = 1, pad: int = 0,
                  bias=None, interpret: bool = False, max_taps: int = 0):
    """One-axis conv on channels-last (N, D, H, W, C) along spatial `axis`
    (1, 2 or 3).  w: (k, Ci, Co)."""
    x_moved = jnp.moveaxis(x, axis, 3)        # conv axis -> W position
    n, a, b, wlen, ci = x_moved.shape
    x2 = x_moved.reshape(n * a * b, wlen, ci)
    y2 = conv_axis_last(x2, w, stride=stride, pad=pad, interpret=interpret,
                        max_taps=max_taps)
    w_out, co = y2.shape[1], y2.shape[2]
    y = y2.reshape(n, a, b, w_out, co)
    y = jnp.moveaxis(y, 3, axis)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def separable_conv3d(x, wx, wy, wz, *, stride=(1, 1, 1), pad=(0, 0, 0),
                     biases=(None, None, None), interpret: bool = False,
                     max_taps: int = 0):
    """The fader DownBlock conv stack: (k,1,1) then (1,k,1) then (1,1,k),
    each with per-axis stride/pad, as three Pallas one-axis convs.

    wx: (k, Ci, C), wy: (k, C, C), wz: (k, C, C) — torch weights
    (O,I,k,1,1)-style collapsed to (k, I, O).  `max_taps=2` is the
    compiled-path mode on this toolchain (see `conv_axis_last`).
    """
    y = conv_one_axis(x, wx, 1, stride=stride[0], pad=pad[0],
                      bias=biases[0], interpret=interpret, max_taps=max_taps)
    y = conv_one_axis(y, wy, 2, stride=stride[1], pad=pad[1],
                      bias=biases[1], interpret=interpret, max_taps=max_taps)
    y = conv_one_axis(y, wz, 3, stride=stride[2], pad=pad[2],
                      bias=biases[2], interpret=interpret, max_taps=max_taps)
    return y


# ---------------------------------------------------------------------------
# fused BN + PReLU/LeakyReLU + shifted-pad-zeroing epilogue
#
# The elementwise tail of every packed ConvBlock (`models/unet_packed.py`
# `_block_as`): folded-BN affine, PReLU, and the `zero_shifted_pads` boundary
# masks, in one VMEM pass.  Zero dots and 128-lane channel tiles — inside
# this toolchain's known-good Mosaic envelope.  Exists to A/B against XLA's
# own fusion of the same chain (which this kernel has to beat to ship —
# see experiments/pallas_ab.py).
# ---------------------------------------------------------------------------


def _bn_act_pads_kernel(x_ref, scale_ref, shift_ref, alpha_ref, md_ref,
                        mh_ref, mw_ref, out_ref):
    # compute in f32: this target's Mosaic rejects bf16 vector compares
    # ("Target does not support this comparison")
    x = x_ref[...].astype(jnp.float32)              # (1, 1, H, W, C8)
    y = (x * scale_ref[...].astype(jnp.float32)     # folded BN affine
         + shift_ref[...].astype(jnp.float32))
    y = jnp.where(y >= 0, y,                        # PReLU / LeakyReLU
                  y * alpha_ref[...].astype(jnp.float32))
    # md is staged (D, 1, C8) so its per-program block (1, 1, C8) has legal
    # last-two block dims (a (1, C8) row of a (D, C8) array violates
    # Mosaic's (8, 128) tile rule)
    m = (md_ref[...][0].astype(jnp.float32)         # (1, C8) -> broadcasts
         * mh_ref[...].astype(jnp.float32)[None, :, None, :]
         * mw_ref[...].astype(jnp.float32)[None, None, :, :])
    out_ref[...] = (y * m).astype(out_ref.dtype)


def bn_act_zero_pads(xs, scale, shift, alpha, masks, *,
                     interpret: bool = False):
    """Fused `prelu(batch_norm(xs)) * pad_masks` on a SHIFTED packed tensor.

    xs: (N, D, H, W, C8); scale/shift: folded BN affine (C8,)
    (gamma/sqrt(var+eps), beta - mean*scale); alpha: PReLU slope
    broadcastable to (C8,); masks: the three per-axis
    `ops.packed._shifted_pad_axis_mask` arrays ((D, C8), (H, C8), (W, C8)).
    Grid: one program per (n, d) plane."""
    n, d, h, w, c8 = xs.shape
    md, mh, mw = masks
    c = jnp.broadcast_to
    out = pl.pallas_call(
        _bn_act_pads_kernel,
        out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
        grid=(n, d),
        in_specs=[
            pl.BlockSpec((1, 1, h, w, c8), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c8,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c8,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c8,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c8), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w, c8), lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs, c(scale, (c8,)).astype(xs.dtype), c(shift, (c8,)).astype(xs.dtype),
      c(alpha, (c8,)).astype(xs.dtype),
      jnp.asarray(md, xs.dtype)[:, None, :],
      mh.astype(xs.dtype), mw.astype(xs.dtype))
    return out


# ---------------------------------------------------------------------------
# k=2 packed conv (the shifted->aligned ConvBlock core) — VERDICT r4 #5
#
# The bf16 192^3 train step spends ~21% in XLA relayout copies around the
# shifted-conv jvp chains (experiments/copy_hunt.py), and every JAX-level
# lever is a recorded negative.  This kernel is the one genuinely new lever:
# the (2,2,2,8Ci,8Co) packed conv expressed inside this toolchain's Mosaic
# envelope — the 8 cell taps split over FOUR pallas_calls of <= 2
# overlapping-window dots each ((qd, qh) chosen per call via BlockSpec row
# offsets, the two qw taps as in-kernel static slices), partials
# accumulated through an aliased accumulator.
# ---------------------------------------------------------------------------


def _conv2_tap_kernel(x_ref, w_ref, acc_ref, out_ref, *, qh, h, wdim):
    x = x_ref[...]                       # (1, 1, H+1, W+1, C8i)
    a = x[0, 0, qh:qh + h, 0:wdim, :].reshape(h * wdim, x.shape[-1])
    b = x[0, 0, qh:qh + h, 1:wdim + 1, :].reshape(h * wdim, x.shape[-1])
    # f32 dot temps: Mosaic REQUIRES a 32-bit matmul accumulator ("Expected
    # matmul acc to be 32-bit" when preferred_element_type=bf16), which is
    # also why the 98^3-block aligned->shifted sites cannot compile — their
    # f32 temps exceed the 16M VMEM stack (17.02M).  Both walls recorded in
    # docs/PERFORMANCE.md (r5 Mosaic-conv closure).
    y = jnp.dot(a, w_ref[0], preferred_element_type=jnp.float32)
    y = y + jnp.dot(b, w_ref[1], preferred_element_type=jnp.float32)
    out_ref[...] = (acc_ref[...].astype(jnp.float32)
                    + y.reshape(acc_ref.shape)).astype(out_ref.dtype)


def conv2_packed_pallas(xs, wp, *, interpret: bool = False):
    """Shifted packed (N, D+1, H+1, W+1, 8Ci) -> aligned (N, D, H, W, 8Co):
    the `ops.packed.conv3_packed` forward as 4 Mosaic kernels.

    Numerics: partials round to xs.dtype between the four calls (the XLA
    conv accumulates all 8 taps in f32 before one cast) — bf16-level
    difference, same as the training dtype."""
    n, d1, h1, w1, c8i = xs.shape
    d, h, wdim = d1 - 1, h1 - 1, w1 - 1
    c8o = wp.shape[-1]
    out = jnp.zeros((n, d, h, wdim, c8o), xs.dtype)
    for qd in range(2):
        for qh in range(2):
            w2 = wp[qd, qh].astype(xs.dtype)          # (2, 8Ci, 8Co)
            out = pl.pallas_call(
                functools.partial(_conv2_tap_kernel, qh=qh, h=h, wdim=wdim),
                out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
                grid=(n, d),
                in_specs=[
                    pl.BlockSpec((1, 1, h1, w1, c8i),
                                 lambda i, j, _q=qd: (i, j + _q, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, c8i, c8o), lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, h, wdim, c8o),
                                 lambda i, j: (i, j, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, h, wdim, c8o),
                                       lambda i, j: (i, j, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                input_output_aliases={2: 0},
                interpret=interpret,
            )(xs, w2, out)
    return out
