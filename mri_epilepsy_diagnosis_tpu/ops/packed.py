"""Space-to-depth ("packed") execution layout for thin-channel 3D CNNs.

Why: XLA-TPU tiles the two minor dims of every HBM array as (8 sublanes,
128 lanes).  Channels-last volumes with C << 128 therefore pad the lane dim
up to 128: a (4,192,192,192,16) bf16 activation occupies 8x its logical
bytes, and profiling (experiments/profile_192.py) shows every thin-channel
192^3/96^3 op in the flagship UNet running exactly at the HBM roofline **of
the padded traffic** — 20-30x off the logical roofline.

Fix: pack 2x2x2 voxel blocks into channels.  A (N,D,H,W,C) volume becomes
(N,D/2,H/2,W/2,8C) with channel index (sd,sh,sw,c) sub-position-major; 8C
reaches the 128-lane width at C=16, eliminating the padding.

Convolution stays exact: a fine k=3/pad=1 conv equals, on the packed grid, a
k=2 VALID conv over a one-voxel-shifted packing.  Output fine index 2X+s
needs fine taps {2X+s-1, 2X+s, 2X+s+1}; after shifting the volume by +1
voxel those all live in packed cells {X, X+1}.  The packed kernel holds
27/64 nonzeros, i.e. 2.37x the fine FLOPs — traded for ~8-16x less HBM
traffic and full MXU lanes (thin-channel convs are heavily BW-bound).

Everything here is pure XLA (reshape/transpose/conv/einsum) — no Pallas —
so it runs identically on CPU (tests) and TPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import functional as F

# ---------------------------------------------------------------------------
# packing / unpacking
# ---------------------------------------------------------------------------


def pack2(x):
    """(N, D, H, W, C) -> (N, D/2, H/2, W/2, 8C), channel = (sd, sh, sw, c)
    sub-position-major.  Spatial dims must be even."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def unpack2(y):
    """Inverse of pack2."""
    n, d2, h2, w2, c8 = y.shape
    c = c8 // 8
    y = y.reshape(n, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d2, 2 * h2, 2 * w2, c)


def pack2_shifted(x):
    """Packing of the volume shifted by +1 voxel per axis (one leading and
    one trailing zero plane), the input form `conv3_packed` consumes:
    (N, D, H, W, C) -> (N, D/2+1, H/2+1, W/2+1, 8C)."""
    x = jnp.pad(x, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
    return pack2(x)


def repack_shifted(xp):
    """Aligned packed activation -> shifted packed (what the next
    `conv3_packed` consumes), without a round trip through fine layout.

    Shifted cell Q sub r on axis a holds fine voxel 2Q-1+r: sub 0 comes from
    the previous aligned cell's sub 1, sub 1 from this cell's sub 0.  Per
    axis this is a pad + two channel-block slices + concat (all lane-aligned
    for C >= 16)."""
    n = xp.shape[0]
    c8 = xp.shape[-1]
    c = c8 // 8
    y = xp.reshape(n, *xp.shape[1:4], 2, 2, 2, c)
    for ax in range(3):  # spatial axis ax <-> sub axis 4+ax
        pad = [(0, 0)] * y.ndim
        pad[1 + ax] = (1, 1)
        yp = jnp.pad(y, pad)
        size = y.shape[1 + ax] + 1
        prev = lax.slice_in_dim(yp, 0, size, axis=1 + ax)      # cells Q-1
        cur = lax.slice_in_dim(yp, 1, size + 1, axis=1 + ax)   # cells Q
        sub0 = lax.slice_in_dim(prev, 1, 2, axis=4 + ax)       # their sub 1
        sub1 = lax.slice_in_dim(cur, 0, 1, axis=4 + ax)        # this sub 0
        y = jnp.concatenate([sub0, sub1], axis=4 + ax)
    return y.reshape(n, *[s + 1 for s in xp.shape[1:4]], c8)


# ---------------------------------------------------------------------------
# convolution
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pack_kernel_index():
    """Scatter indices mapping fine (t, ci, co) kernel entries into the
    (2,2,2, 8ci, 8co) packed kernel (numpy, computed once)."""
    src, dst = [], []
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                so = (sd * 2 + sh) * 2 + sw
                for td in range(3):
                    for th in range(3):
                        for tw in range(3):
                            qd, rd = divmod(sd + td, 2)  # td-1 +1 shift
                            qh, rh = divmod(sh + th, 2)
                            qw, rw = divmod(sw + tw, 2)
                            si = (rd * 2 + rh) * 2 + rw
                            src.append((td, th, tw))
                            dst.append((qd, qh, qw, si, so))
    return np.asarray(src), np.asarray(dst)


def pack_weights2(w):
    """Fine (3,3,3,Ci,Co) conv kernel -> packed (2,2,2,8Ci,8Co).

    Entry [q, (r,ci), (s,co)] = w[t] where the output sub s's tap t lands on
    shifted-input cell offset q sub r:  q, r = divmod(s + t, 2)  per axis
    (t here is the 0..2 kernel index; the +1 input shift is already folded
    in).  27 of 64 (q, r, s) combinations are populated."""
    ci, co = w.shape[3], w.shape[4]
    src, dst = _pack_kernel_index()
    wp = jnp.zeros((2, 2, 2, 8, ci, 8, co), w.dtype)
    wp = wp.at[dst[:, 0], dst[:, 1], dst[:, 2], dst[:, 3], :,
               dst[:, 4], :].set(w[src[:, 0], src[:, 1], src[:, 2]])
    return wp.reshape(2, 2, 2, 8 * ci, 8 * co)


def conv3_packed(xp_shifted, wp, bias=None):
    """k=2 VALID conv over shifted-packed input == fine k=3/pad=1 conv.

    xp_shifted: (N, S/2+1, ..., 8Ci)  (from pack2_shifted/repack_shifted)
    wp:         (2, 2, 2, 8Ci, 8Co)   (from pack_weights2)
    bias:       fine (Co,) — tiled over sub-positions here.
    Returns aligned packed output (N, S/2, ..., 8Co).
    """
    y = lax.conv_general_dilated(
        xp_shifted, wp.astype(xp_shifted.dtype),
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(xp_shifted, jnp.float32),
        precision=F._precision_for(xp_shifted.dtype),
    ).astype(xp_shifted.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


def conv1_packed(xp, w, bias=None):
    """Fine 1x1x1 conv (e.g. the classifier head) in packed layout: a pure
    per-sub channel contraction.  w: (1,1,1,Ci,Co) or (Ci,Co)."""
    w = w.reshape(w.shape[-2], w.shape[-1])
    ci, co = w.shape
    n, d, h, wd, _ = xp.shape
    x = xp.reshape(n, d, h, wd, 8, ci)
    y = jnp.einsum("ndhwsi,io->ndhwso", x, w.astype(xp.dtype),
                   precision=F._precision_for(xp.dtype),
                   preferred_element_type=F._preferred_for(xp, jnp.float32))
    y = y.astype(xp.dtype).reshape(n, d, h, wd, 8 * co)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# elementwise / norm / pool / resize
# ---------------------------------------------------------------------------


def tile_channel_param(p):
    """Fine per-channel parameter (C,) -> packed (8C,)."""
    return jnp.tile(p, 8)


def batch_norm_packed(xp, mean, var, gamma, beta, eps=1e-5):
    return F.batch_norm(xp, tile_channel_param(mean), tile_channel_param(var),
                        tile_channel_param(gamma), tile_channel_param(beta),
                        eps)


def maxpool2_packed(xp):
    """Fine 2x2x2/stride-2 maxpool, packed -> packed at the pooled scale:
    (N, S/2, ..., 8C) -> (N, S/4, ..., 8C).  The fine pooling windows are
    exactly the packed sub-positions, so this is a sub-axis max + repack."""
    n, d, h, w, c8 = xp.shape
    c = c8 // 8
    pooled = xp.reshape(n, d, h, w, 8, c).max(axis=4)   # fine pooled @ cells
    return pack2(pooled)


@functools.lru_cache(maxsize=None)
def _upsample2_matrix(out_size: int):
    """Fine trilinear x2 matrix (out, out//2), align_corners=False."""
    return F._linear_matrix(out_size // 2, out_size, False)


def upsample2_packed(xp):
    """Fine trilinear 2x upsample (align_corners=False), packed -> packed:
    (N, S/2 cells of the S fine grid? no — cells of the coarse grid) ->
    cells of the doubled grid.  Per axis: expose that axis's sub bit (a
    lane-aligned reshape/transpose), apply the fine interpolation matrix,
    re-fold the sub bit."""
    n = xp.shape[0]
    c8 = xp.shape[-1]
    c = c8 // 8
    y = xp.reshape(n, *xp.shape[1:4], 2, 2, 2, c)
    for ax in range(3):
        cells = y.shape[1 + ax]
        fine_in = 2 * cells
        m = jnp.asarray(_upsample2_matrix(2 * fine_in), y.dtype)
        # bring the sub bit next to its cell axis -> fine axis
        y = jnp.moveaxis(y, 4 + ax, 2 + ax)
        shp = y.shape
        y = y.reshape(*shp[:1 + ax], fine_in, *shp[3 + ax:])
        y = jnp.moveaxis(y, 1 + ax, -1)
        y = jnp.einsum("...i,oi->...o", y, m,
                       precision=F._precision_for(y.dtype),
                       preferred_element_type=y.dtype)
        y = jnp.moveaxis(y, -1, 1 + ax)
        y = y.reshape(*shp[:1 + ax], 2 * fine_in // 2, 2, *shp[3 + ax:])
        y = jnp.moveaxis(y, 2 + ax, 4 + ax)
    return y.reshape(n, *[2 * s for s in xp.shape[1:4]], c8)


def concat_channels_packed(a, b):
    """Fine channel concat in packed layout: per-sub interleave."""
    n, d, h, w, ca = a.shape
    cb = b.shape[-1]
    a = a.reshape(n, d, h, w, 8, ca // 8)
    b = b.reshape(n, d, h, w, 8, cb // 8)
    return jnp.concatenate([a, b], axis=-1).reshape(
        n, d, h, w, ca + cb)
