"""Packed (space-to-depth) execution layout for the fader encoder.

The fader `DownBlock` (reference `classification/models/AE_model.py:4-53`)
is three separable convs — (k,1,1), (1,k,1), (1,1,k), each stride 2 with
pad k/2-1 — followed by a 2x2x2 maxpool, BN and LeakyReLU.  In the fine
channels-last layout those convs are thin-lane (1-32 channels of a 128-lane
register) and run ~350x off roofline: the whole 192^3 encoder costs ~7 ms/vol
at b8 (bench r2) against ~0.02 ms of MXU time.

The packed layout fixes the lane waste the same way `models/unet_packed.py`
does for the UNet, with two extra structural gifts unique to this geometry:

- a fine k,s=2,p=k/2-1 conv along one axis maps EXACTLY onto a
  (k/2+1)-cell, stride-2-cell conv over packed cells: with output fine index
  o = 2*co + so and input i = 2*ci + ri, the tap index is t = 2q + ri - 2so
  (q the cell offset) — the fine padding p cancels into whole zero cells,
  so there is no pad-slot bookkeeping at all (unlike the UNet's shifted
  layout).  Numerics are bit-identical to the fine path.
- the 2x2x2 stride-2 maxpool windows coincide with packed cells, so the
  pool is a pure max over the 8 sub-position channel groups — an
  elementwise VPU op instead of a windowed reduction.

Each block therefore runs: pack2 -> three packed axis convs (channels
8Ci -> 8Co, MXU-sized) -> per-cell sub max (= the fine maxpool) -> BN ->
LeakyReLU, emerging in fine layout at 1/4 resolution for the next block.

Applies eval-mode only (running BN stats), mirroring `encoder_apply_fused`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import functional as F
from ..ops.packed import pack2
from .fader import _act


@functools.lru_cache(maxsize=None)
def _axis_table_strided(k: int, p: int):
    """Connection table of a fine (k, stride 2, pad p) conv in cell space.

    Fine output o = 2*co + so reads fine input i = 2*o - p + t, i.e. input
    cell ci = 2*co + q' with 2*q' + ri = 2*so - p + t — each (t, so) pair
    lands on exactly one (q', ri).  Returns (A[q, r, s, t] 0/1 with
    q = q' - q'_min, pad_lo = -q'_min)."""
    entries = []
    for t in range(k):
        for s in range(2):
            r = (t - p) % 2
            q = (t - r + 2 * s - p) // 2
            entries.append((q, r, s, t))
    qmin = min(e[0] for e in entries)
    qmax = max(e[0] for e in entries)
    a = np.zeros((qmax - qmin + 1, 2, 2, k), np.float32)
    for q, r, s, t in entries:
        a[q - qmin, r, s, t] = 1.0
    return a, -qmin


def pack_sepconv_weight(w_axis, axis: int, pad: int):
    """Fine separable kernel (k, Ci, Co) -> (packed strided kernel for
    `axis` (0=d, 1=h, 2=w), cell pad_lo): spatial extent Q on that axis,
    channels (rd,rh,rw,Ci) -> (sd,sh,sw,Co), identity on non-conv subs."""
    k, ci, co = w_axis.shape
    table, pad_lo = _axis_table_strided(k, pad)
    a = jnp.asarray(table, w_axis.dtype)
    eye = jnp.eye(2, dtype=w_axis.dtype)
    # output order: q, (rd rh rw ci) -> flat in, (sd sh sw co) -> flat out
    if axis == 0:
        wp = jnp.einsum("qrst,tio,hH,wW->qrhwisHWo", a, w_axis, eye, eye)
    elif axis == 1:
        wp = jnp.einsum("qhHt,tio,rs,wW->qrhwisHWo", a, w_axis, eye, eye)
    else:
        wp = jnp.einsum("qwWt,tio,rs,hH->qrhwisHWo", a, w_axis, eye, eye)
    q_cells = table.shape[0]
    wp = wp.reshape(q_cells, 8 * ci, 8 * co)
    shape = [1, 1, 1, 8 * ci, 8 * co]
    shape[axis] = q_cells
    return wp.reshape(shape), pad_lo


def conv_axis_packed(xp, wp, bias, axis: int, pad_lo: int):
    """Packed strided separable conv along `axis`: kernel Q cells, stride 2
    cells; cell padding (pad_lo, Q-2-pad_lo) keeps out = in/2 cells."""
    q_cells = wp.shape[axis]
    strides = [1, 1, 1]
    strides[axis] = 2
    pad = [(0, 0)] * 3
    pad[axis] = (pad_lo, q_cells - 2 - pad_lo)
    y = lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), tuple(strides), pad,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(xp, jnp.float32),
        precision=F._precision_for(xp.dtype),
    ).astype(xp.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


def downblock_apply_fine(params, stats, x, *, conv_k=6, conv_s=2,
                         conv_pad=None, maxpool_k=2, maxpool_s=2,
                         batch_norm=True, act="l_relu"):
    """Plain fine-layout eval DownBlock (separable convs as-is): the
    fallback for shapes/configs the packed form can't take."""
    k, s = conv_k, conv_s
    p = conv_pad if conv_pad is not None else conv_k // 2 - 1
    for axis, key in enumerate(
            ("block__1_convx", "block__2_convy", "block__3_convz")):
        stride = [1, 1, 1]
        padding = [0, 0, 0]
        stride[axis] = s
        padding[axis] = p
        x = F.conv3d(x, params[key]["weight"].astype(x.dtype),
                     params[key].get("bias"), stride=tuple(stride),
                     padding=tuple(padding))
    shape_before_pool = tuple(x.shape[1:4])
    x = F.maxpool3d(x, maxpool_k, maxpool_s)
    if batch_norm:
        bn = params["block__5_batch_norm"]
        st = stats["block__5_batch_norm"]
        x = F.batch_norm(x, st["running_mean"], st["running_var"],
                         bn["weight"], bn["bias"])
    return _act(act)(x), shape_before_pool


def downblock_apply_packed(params, stats, x, *, conv_k=6, conv_s=2,
                           conv_pad=None, maxpool_k=2, maxpool_s=2,
                           batch_norm=True, act="l_relu"):
    """Eval-mode DownBlock in the packed layout.  x fine (N,D,H,W,C) with
    even D/H/W; returns (fine output at 1/4 resolution, shape_before_pool).

    Exact-parity constraints (assert, not silently wrong): stride 2, even
    k, pad k/2-1 (the only configs the reference fader ever uses), pool
    2x2x2 — these are what let the conv/pool collapse onto cells.
    """
    k, p = conv_k, conv_pad if conv_pad is not None else conv_k // 2 - 1
    assert conv_s == 2 and k % 2 == 0 and p == k // 2 - 1, (
        f"packed DownBlock needs even k, s=2, p=k/2-1; got k={k} s={conv_s} "
        f"p={p} — use the module path for other configs")
    assert maxpool_k == 2 and maxpool_s == 2, "packed pool needs k=s=2"
    assert all(s % 4 == 0 for s in x.shape[1:4]), (
        f"spatial dims {x.shape[1:4]} must be divisible by 4 "
        f"(2 for packing x 2 for the stride)")

    xp = pack2(x)
    for axis, key in enumerate(
            ("block__1_convx", "block__2_convy", "block__3_convz")):
        w = params[key]["weight"]
        idx = [0, 0, 0]
        idx[axis] = slice(None)
        w_axis = w[tuple(idx)]                       # (k, ci, co)
        wp, pad_lo = pack_sepconv_weight(w_axis, axis, p)
        xp = conv_axis_packed(xp, wp, params[key].get("bias"), axis, pad_lo)

    shape_before_pool = tuple(2 * s for s in xp.shape[1:4])
    n, dc, hc, wc, c8 = xp.shape
    # fine 2x2x2 s2 maxpool == max over the 8 sub-position groups per cell
    y = jnp.max(xp.reshape(n, dc, hc, wc, 8, c8 // 8), axis=4)

    if batch_norm:
        bn = params["block__5_batch_norm"]
        st = stats["block__5_batch_norm"]
        y = F.batch_norm(y, st["running_mean"], st["running_var"],
                         bn["weight"], bn["bias"])
    return _act(act)(y), shape_before_pool


def encoder_apply_packed(variables, x, ae_kwargs):
    """Eval-mode `Encoder.apply` -> (latent, size_list) in the packed
    execution layout; parity with the module path is test-verified.

    Same variables, same kwargs schema (`train_ENC_CLF.ipynb` cell 17);
    the reference geometry (192^3, k=6, s=2, p=2, pool 2) packs end to end
    — other configs should use `make_encoder(...).apply`.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    offset = 1 if ae_kwargs.get("reduce_size") else 0
    if offset:
        w = params["encode__0"]["weight"]
        b = params["encode__0"].get("bias")
        x = F.conv3d(x, w.astype(x.dtype), b, stride=4, padding=0)
    dbk = dict(ae_kwargs["down_block_kwargs"])
    kwargs = dict(
        conv_k=dbk.get("conv_k", 3), conv_s=dbk.get("conv_s", 1),
        conv_pad=dbk.get("conv_pad"),
        maxpool_k=dbk.get("maxpool_k", 2), maxpool_s=dbk.get("maxpool_s", 2),
        batch_norm=dbk.get("batch_norm", True), act=dbk.get("act", "relu"))
    packable = (kwargs["conv_s"] == 2 and kwargs["conv_k"] % 2 == 0
                and (kwargs["conv_pad"] is None
                     or kwargs["conv_pad"] == kwargs["conv_k"] // 2 - 1)
                and kwargs["maxpool_k"] == 2 and kwargs["maxpool_s"] == 2)
    size_list = []
    for i in range(ae_kwargs["deapth"]):
        key = f"encode__{i + offset}"
        # deep blocks shrink below packability (e.g. 192^3 -> 12^3 -> 3^3);
        # they cost nothing, so they run fine-layout
        fn = (downblock_apply_packed
              if packable and all(s % 4 == 0 for s in x.shape[1:4])
              else downblock_apply_fine)
        x, size = fn(params[key], stats.get(key, {}), x, **kwargs)
        size_list.append(size)
    return x, size_list
