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

Why not a deeper 4x4x4 pack (ocfl=8 gives only 64 lanes at pack2): the
packed conv is dense over sub-position pairs, so a fine k=3 conv on a
4^3-packed grid executes k=2 x 64_in x 64_out sub-position contractions =
512 MAC per fine voxel per (c_in,c_out) against the logical 27 — a 19x
FLOP overhead vs pack2's 2.37x.  The lane fill would have to buy back an
8x compute inflation; pack2 is the sweet spot and the remaining half-empty
lanes exist only in the two ocfl=8 stem convs.
"""
from __future__ import annotations

import functools
import os

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
    sub-position-major.  Spatial dims must be even.

    Kept as a plain reshape/transpose on purpose: standalone, an identity
    stride-2 conv is 6-10x faster (experiments/pack2_probe.py), but inside
    the full fused forward XLA folds this transpose into the adjacent conv
    layouts and the conv formulation is ~20% SLOWER end to end
    (experiments/ab_pack2.py: 30.3 vol/s transpose vs 25.4 conv, b8 192^3)."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def unpack2(y):
    """Inverse of pack2 (see pack2 for why this stays a transpose)."""
    n, d2, h2, w2, c8 = y.shape
    c = c8 // 8
    y = y.reshape(n, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d2, 2 * h2, 2 * w2, c)


@functools.lru_cache(maxsize=None)
def _pack2_identity_kernel(c: int):
    """(2,2,2,C,8C) identity space-to-depth kernel: one 1.0 per output
    channel sub*C+i at tap (sd,sh,sw)=sub, matching pack2's channel order."""
    k = np.zeros((2, 2, 2, c, 8 * c), np.float32)
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                sub = (sd * 2 + sh) * 2 + sw
                for i in range(c):
                    k[sd, sh, sw, i, sub * c + i] = 1.0
    return k


def pack2_conv(x):
    """pack2 via an identity stride-2 conv — exact (every output voxel is a
    sum with one nonzero term).

    The transpose form wins when XLA can fold it into an adjacent conv's
    layouts (experiments/ab_pack2.py), but for a STANDALONE pack feeding
    only elementwise/reduction ops — the training targets — the transpose
    materializes its (N, D/2, 2, ..., 2, C) intermediate with a 2-element
    axis lane-padded to 128: 64x expansion at C=1, 5.06 GB at 192^3 b3 and
    that graph's HBM OOM (experiments/midpoint_probe.py round 3).  The conv
    form never leaves (8,128)-friendly shapes."""
    k = jnp.asarray(_pack2_identity_kernel(x.shape[-1]), x.dtype)
    return lax.conv_general_dilated(
        x, k, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=F.CONV3D_DIMS,
        precision=F._precision_for(x.dtype))


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
def _axis_table_sa():
    """Per-axis packing tensor A[t, q, r, s] = 1 iff output sub s's tap t
    reads shifted-input cell offset q sub r ((q, r) = divmod(s + t, 2))."""
    a = np.zeros((3, 2, 2, 2), np.float32)
    for t in range(3):
        for s in range(2):
            q, r = divmod(s + t, 2)
            a[t, q, r, s] = 1.0
    return a


def pack_weights2(w):
    """Fine (3,3,3,Ci,Co) conv kernel -> packed (2,2,2,8Ci,8Co).

    Entry [q, (r,ci), (s,co)] = w[t] where the output sub s's tap t lands on
    shifted-input cell offset q sub r:  q, r = divmod(s + t, 2)  per axis
    (t here is the 0..2 kernel index; the +1 input shift is already folded
    in).  27 of 64 (q, r, s) combinations are populated.

    Built as one einsum with three constant 0/1 axis tensors (exact: every
    output entry has at most one nonzero term).  The earlier 216-entry
    scatter construction compiled to chains of dynamic-update-slice ops that
    cost ~25 ms/step in the 192^3 train graph (trace, round 3)."""
    ci, co = w.shape[3], w.shape[4]
    a = jnp.asarray(_axis_table_sa(), w.dtype)
    wp = jnp.einsum("adef,bghi,cjkl,abcmn->dgjehkmfiln", a, a, a, w)
    return wp.reshape(2, 2, 2, 8 * ci, 8 * co)


def _dw_packed_qgroup(x_padded, g):
    """Dense packed dw (2,2,2,8Ci,8Co) as 8 per-q-offset contractions.

    `x_padded` is the conv's logical input INCLUDING its padding, so the
    slice at offset q aligns with every output position of `g`.  Measured
    ~2x faster than XLA's conv dw rule on this TPU toolchain at the 192^3
    b1 train shapes, and compiles in seconds instead of minutes
    (experiments/bwd_profile.py).  Einsum (not reshape+matmul) so GSPMD can
    keep spatially-sharded operands sharded (partial dots + psum)."""
    od, oh, ow = g.shape[1:4]
    rows = []
    for qd in range(2):
        for qh in range(2):
            for qw in range(2):
                sl = lax.slice(
                    x_padded, (0, qd, qh, qw, 0),
                    (x_padded.shape[0], qd + od, qh + oh, qw + ow,
                     x_padded.shape[4]))
                rows.append(jnp.einsum(
                    "ndhwi,ndhwo->io", sl, g,
                    preferred_element_type=jnp.float32,
                    precision=F._precision_for(x_padded.dtype)))
    return jnp.stack(rows).reshape(2, 2, 2, x_padded.shape[4], g.shape[4])


def _conv3_packed_raw(xp_shifted, wp):
    if (os.environ.get("MRI_TPU_PALLAS_CONV2", "0") == "1"
            and xp_shifted.shape[-1] >= 64):
        # Mosaic 4x2-tap kernel (experiments/pallas_conv2_ab.py): 1.69x
        # SLOWER standalone at the dec1 shape; opt-in for the in-graph
        # copy-elimination A/B only (VERDICT r4 #5).  <64-lane sites stay
        # on the lax conv (Mosaic rejects the thin-minor reshape).
        from .pallas_kernels import conv2_packed_pallas

        return conv2_packed_pallas(xp_shifted, wp)
    return lax.conv_general_dilated(
        xp_shifted, wp.astype(xp_shifted.dtype),
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(xp_shifted, jnp.float32),
        precision=F._precision_for(xp_shifted.dtype),
    ).astype(xp_shifted.dtype)


@jax.custom_vjp
def _conv3_packed_core(xp_shifted, wp):
    """Shifted->aligned packed conv with a hand-rolled VJP: XLA's conv
    gradient rules are ~2x slower than this formulation at the packed train
    shapes and their compiles crash/413 the remote helper
    (experiments/bwd_profile.py)."""
    return _conv3_packed_raw(xp_shifted, wp)


def _conv3_packed_fwd(xp_shifted, wp):
    return _conv3_packed_raw(xp_shifted, wp), (xp_shifted, wp)


def _conv3_packed_bwd(res, g):
    xs, wp = res
    # dx: transpose of a k=2 VALID conv == k=2 pad-1 conv with the
    # spatially-flipped, io-swapped kernel (an aligned->shifted conv)
    w_t = jnp.flip(wp, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = lax.conv_general_dilated(
        g, w_t.astype(g.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(g, jnp.float32),
        precision=F._precision_for(g.dtype),
    ).astype(xs.dtype)
    dx = _pin_layout(dx)
    dwp = _dw_packed_qgroup(xs, g).astype(wp.dtype)
    return dx, dwp


_conv3_packed_core.defvjp(_conv3_packed_fwd, _conv3_packed_bwd)


# A/B toggle (experiments/train192_vjp_probe.py): the custom conv VJPs are
# the production path; MRI_TPU_PACKED_VJP=0 restores XLA's gradient rules.
_USE_CUSTOM_VJP = os.environ.get("MRI_TPU_PACKED_VJP", "1") != "0"

# Optional layout pinning (experiments/layout_pin_ab.py, VERDICT r3 ask #4):
# the bf16 192^3 train step spends ~21% of its time (78.6 of 375 ms b2, 32
# GB/step) in XLA layout-conversion copies around the shifted-conv jvp
# chains.  MRI_TPU_PIN_LAYOUT constrains every packed conv output (and the
# custom-VJP dx) to ONE layout so fwd producers and bwd consumers agree:
#   "rowmajor" — the default {4,3,2,1,0} minor-to-major;
#   "convfav"  — {4,1,3,2,0}, the layout XLA's conv lowering prefers here
#                (the relayout target observed in the copy hunt).
_PIN_LAYOUT = os.environ.get("MRI_TPU_PIN_LAYOUT", "")


def _pin_layout(x):
    if not _PIN_LAYOUT or x.ndim != 5:
        return x
    m2m = {"rowmajor": (0, 1, 2, 3, 4),
           "convfav": (0, 2, 3, 1, 4)}.get(_PIN_LAYOUT)
    if m2m is None:
        return x
    from jax.experimental import layout as jl

    return jl.with_layout_constraint(x, jl.Layout(m2m))


def conv3_packed(xp_shifted, wp, bias=None, custom_vjp=None):
    """k=2 VALID conv over shifted-packed input == fine k=3/pad=1 conv.

    xp_shifted: (N, S/2+1, ..., 8Ci)  (from pack2_shifted/repack_shifted)
    wp:         (2, 2, 2, 8Ci, 8Co)   (from pack_weights2)
    bias:       fine (Co,) — tiled over sub-positions here.
    Returns aligned packed output (N, S/2, ..., 8Co).

    `custom_vjp` (default: the MRI_TPU_PACKED_VJP env, on) picks the
    hand-rolled qgroup gradient rules — ~2x faster AND the only compiling
    form at the 192^3 b1/b2 seg-training shapes, but a LOSS at the
    VoxResNet b10 classification shapes, where XLA's own conv gradients
    run the step at 48.7 vs 34.1 vol/s (experiments/voxresnet_packed_ab.py
    r5) — shape-dependent, so per-call.
    """
    use = _USE_CUSTOM_VJP if custom_vjp is None else custom_vjp
    y = (_conv3_packed_core(xp_shifted, wp) if use
         else _conv3_packed_raw(xp_shifted, wp))
    y = _pin_layout(y)
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


def conv1_packed_blockdiag(xp, w, bias=None):
    """`conv1_packed` without the sub-axis reshape: contract the full 8Ci
    channel dim against a block-diagonal (8Ci, 8Co) weight, kron(I_8, w).

    The (…, 8, Ci) reshape in `conv1_packed` makes XLA relayout its input
    W-minor so the reshape becomes a bitcast — a full extra pass over the
    decoder output (copy.483: 3.6 GB/step, ~9 ms of the b16 192^3 inference
    graph, experiments/infer_copy_hunt.py round 3).  The dense block-diag
    dot keeps the lane-major layout; the 8x head-FLOP inflation is nothing
    (the head is 1x1x1 with Ci=16)."""
    w = w.reshape(w.shape[-2], w.shape[-1])
    wb = jnp.kron(jnp.eye(8, dtype=w.dtype), w)
    y = jnp.einsum("ndhwi,io->ndhwo", xp, wb.astype(xp.dtype),
                   precision=F._precision_for(xp.dtype),
                   preferred_element_type=F._preferred_for(xp, jnp.float32)
                   ).astype(xp.dtype)
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


# ---------------------------------------------------------------------------
# v2: alternating aligned<->shifted convs (zero repacks network-wide)
#
# Round-2 TPU profiling (experiments/roofline.py) showed `repack_shifted`
# runs 13x off HBM bandwidth (sub-bit reshapes force thin-lane relayouts),
# eating the packed layout's win.  Fix: a fine k=3/pad=1 conv ALSO equals a
# k=2 packed conv from the ALIGNED packing to the SHIFTED packing (cells
# {X-1, X} cover output fine voxels 2X-1+r).  Alternate conv1: aligned ->
# shifted and conv2: shifted -> aligned and no repack is ever needed.
#
# Caveat: the shifted layout carries one pad voxel per axis (fine -1 and
# 2S).  BatchNorm/activation treat them as data, so they must be re-zeroed
# before the next (s->a) conv — `zero_shifted_pads` multiplies the six
# boundary planes by channel masks (cheap: planes only).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _axis_table_as():
    """Per-axis tensor A[t, p, q, r] = 1 iff shifted output sub r's tap t
    reads aligned cell offset p (kernel index) sub q
    ((p - 1, q) = divmod(r + t - 2, 2))."""
    a = np.zeros((3, 2, 2, 2), np.float32)
    for t in range(3):
        for r in range(2):
            o, q = divmod(r + t - 2, 2)
            a[t, o + 1, q, r] = 1.0
    return a


def pack_weights2_as(w):
    """Fine (3,3,3,Ci,Co) kernel -> packed (2,2,2,8Ci,8Co) mapping ALIGNED
    input cells to SHIFTED output cells (`conv3_packed_as`).  Same
    constant-einsum construction as `pack_weights2`."""
    ci, co = w.shape[3], w.shape[4]
    a = jnp.asarray(_axis_table_as(), w.dtype)
    wp = jnp.einsum("adef,bghi,cjkl,abcmn->dgjehkmfiln", a, a, a, w)
    return wp.reshape(2, 2, 2, 8 * ci, 8 * co)


def _conv3_packed_as_raw(xp_aligned, wp):
    if os.environ.get("MRI_TPU_PALLAS_CONV2_AS", "0") == "1":
        # the pad-1 aligned->shifted conv as the same Mosaic kernel over a
        # one-cell zero-padded input.  DOES NOT COMPILE at the production
        # 97^3-cell sites: the (1,1,98,98,128) block's f32 dot temps need
        # 17.02M of the 16M VMEM stack, and Mosaic rejects bf16 matmul
        # accumulators, so the temps cannot shrink.  Kept for small-shape
        # experiments only (docs/PERFORMANCE.md r5).
        from .pallas_kernels import conv2_packed_pallas

        xpad = jnp.pad(xp_aligned, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
        return conv2_packed_pallas(xpad, wp)
    return lax.conv_general_dilated(
        xp_aligned, wp.astype(xp_aligned.dtype),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(xp_aligned, jnp.float32),
        precision=F._precision_for(xp_aligned.dtype),
    ).astype(xp_aligned.dtype)


@jax.custom_vjp
def _conv3_packed_as_core(xp_aligned, wp):
    """Aligned->shifted packed conv with the same hand-rolled VJP strategy
    as `_conv3_packed_core` (see `_dw_packed_qgroup`)."""
    return _conv3_packed_as_raw(xp_aligned, wp)


def _conv3_packed_as_fwd(xp_aligned, wp):
    return _conv3_packed_as_raw(xp_aligned, wp), (xp_aligned, wp)


def _conv3_packed_as_bwd(res, g):
    xp, wp = res
    # dx: transpose of a k=2 pad-1 conv == k=2 VALID conv with the
    # spatially-flipped, io-swapped kernel (a shifted->aligned conv)
    w_t = jnp.flip(wp, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = lax.conv_general_dilated(
        g, w_t.astype(g.dtype), (1, 1, 1), "VALID",
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(g, jnp.float32),
        precision=F._precision_for(g.dtype),
    ).astype(xp.dtype)
    dx = _pin_layout(dx)
    xpad = jnp.pad(xp, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
    dwp = _dw_packed_qgroup(xpad, g).astype(wp.dtype)
    return dx, dwp


_conv3_packed_as_core.defvjp(_conv3_packed_as_fwd, _conv3_packed_as_bwd)


def conv3_packed_as(xp_aligned, wp, bias=None, custom_vjp=None):
    """Fine k=3/pad=1 conv as a k=2/pad=1 packed conv, aligned -> shifted.

    xp_aligned: (N, S/2, ..., 8Ci); wp from `pack_weights2_as`.
    Returns shifted packed output (N, S/2+1, ..., 8Co) whose pad voxels
    (fine -1 and S per axis) hold the conv's pad-extrapolation — zero, as
    long as the input's own pads are honoured by the conv's zero padding.
    `custom_vjp`: see `conv3_packed` — per-call gradient-rule choice.
    """
    use = _USE_CUSTOM_VJP if custom_vjp is None else custom_vjp
    y = (_conv3_packed_as_core(xp_aligned, wp) if use
         else _conv3_packed_as_raw(xp_aligned, wp))
    y = _pin_layout(y)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _shifted_pad_masks(c8: int):
    """Channel masks (numpy, (8C,)) keeping only NON-pad sub-positions for
    the first/last cell along each axis of a shifted tensor: first cell's
    sub-0 of axis a is fine voxel -1 (pad); last cell's sub-1 is fine S."""
    masks = []
    c = c8 // 8
    for axis in range(3):
        sub = (np.arange(c8) // c).astype(np.int64)
        bitval = (sub >> (2 - axis)) & 1
        lo = (bitval == 1).astype(np.float32)   # first cell: keep sub 1
        hi = (bitval == 0).astype(np.float32)   # last cell: keep sub 0
        masks.append((lo, hi))
    return masks


@functools.lru_cache(maxsize=None)
def _shifted_pad_axis_mask(axis: int, cells: int, c8: int):
    """(cells, c8) multiplier: 1 everywhere except the pad sub-positions of
    the first/last cell along `axis` (numpy, built once per shape)."""
    lo, hi = _shifted_pad_masks(c8)[axis]
    m = np.ones((cells, c8), np.float32)
    m[0] = lo
    m[-1] = hi
    return m


def zero_shifted_pads(xs):
    """Zero the pad voxels of a shifted packed tensor (after BN/activation
    made them nonzero).

    One fused elementwise multiply by the product of three broadcast
    per-axis masks: the earlier six boundary-plane `.at[].multiply` updates
    compiled to full-tensor dynamic-update-slice copies on this toolchain
    (~2 ms each in the 192^3 train trace), while this forms a single fusion
    with the surrounding BN/activation chain — and its VJP is the same
    single multiply."""
    c8 = xs.shape[-1]
    md = jnp.asarray(_shifted_pad_axis_mask(0, xs.shape[1], c8), xs.dtype)
    mh = jnp.asarray(_shifted_pad_axis_mask(1, xs.shape[2], c8), xs.dtype)
    mw = jnp.asarray(_shifted_pad_axis_mask(2, xs.shape[3], c8), xs.dtype)
    return (xs * md[:, None, None, :] * mh[None, :, None, :]
            * mw[None, None, :, :])


@functools.lru_cache(maxsize=None)
def _input_kernel_index():
    """Scatter indices folding pack2_shifted into the first conv: a fine
    k=3/pad=1 conv emitting the SHIFTED packing directly is a k=4/stride-2/
    pad-2 fine conv; per axis tap kk = r + t."""
    src, dst = [], []
    for rd in range(2):
        for rh in range(2):
            for rw in range(2):
                so = (rd * 2 + rh) * 2 + rw
                for td in range(3):
                    for th in range(3):
                        for tw in range(3):
                            src.append((td, th, tw))
                            dst.append((rd + td, rh + th, rw + tw, so))
    return np.asarray(src), np.asarray(dst)


def pack_input_weights(w):
    """Fine (3,3,3,Ci,Co) -> (4,4,4,Ci,8Co) for `conv_input_packed`."""
    ci, co = w.shape[3], w.shape[4]
    src, dst = _input_kernel_index()
    wp = jnp.zeros((4, 4, 4, ci, 8, co), w.dtype)
    wp = wp.at[dst[:, 0], dst[:, 1], dst[:, 2], :,
               dst[:, 3], :].set(w[src[:, 0], src[:, 1], src[:, 2]])
    return wp.reshape(4, 4, 4, ci, 8 * co)


def conv_input_packed(x_fine, wp, bias=None):
    """Fine (N,S,S,S,Ci) input -> first conv's SHIFTED packed output
    (N,S/2+1,...,8Co), fusing pack2_shifted into the convolution
    (k=4, stride 2, pad 2)."""
    y = lax.conv_general_dilated(
        x_fine, wp.astype(x_fine.dtype),
        window_strides=(2, 2, 2), padding=[(2, 2)] * 3,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(x_fine, jnp.float32),
        precision=F._precision_for(x_fine.dtype),
    ).astype(x_fine.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# v2: fused decoder upsample+conv (transposed conv on packed cells)
#
# The decoder step `conv3(cat(skip, up(x)), w)` splits over w's input
# channels into conv_s(skip) + conv_u(up(x)).  conv_u∘up composes into ONE
# lhs_dilation=2 convolution on the packed cells (XLA-TPU runs these at
# ~100 TFLOP/s, 2x the plain-conv rate — experiments/xla_probe2.py), which
# deletes the explicit trilinear upsample (60 ms at the dec1 shape, 25x off
# HBM roofline) and the channel concat.
#
# Boundary exactness: align_corners=False clamping is reproduced by edge-
# padding the coarse cells (`edge_pad_cells`); the remaining error — conv
# taps reading up[-1]/up[S] which the fine op zero-pads but the composed
# translation-invariant kernel extrapolates — affects exactly one fine
# output plane per face and is overwritten with directly-computed exact
# values (`_upconv_fix_faces`).
# ---------------------------------------------------------------------------

_UP_TAPS = np.asarray([0.25, 0.75, 0.75, 0.25])  # fine 2x, half-pixel


@functools.lru_cache(maxsize=None)
def _upconv_axis_table():
    """C1[k, q, r, t]: per-axis coefficient of fine tap t for dilated-kernel
    index k (of 5), input sub q, output sub r: v[j], j = 5 - 2k + r + t - 2q
    when 0 <= j <= 3."""
    c1 = np.zeros((5, 2, 2, 3))
    for k in range(5):
        for q in range(2):
            for r in range(2):
                for t in range(3):
                    j = 5 - 2 * k + r + t - 2 * q
                    if 0 <= j <= 3:
                        c1[k, q, r, t] = _UP_TAPS[j]
    return c1


def pack_upconv_weights(w_u):
    """Fine conv kernel slice (3,3,3,Ci,Co) acting on the upsampled input
    -> composed packed transposed-conv kernel (5,5,5,8Ci,8Co) for
    `upconv_packed` (lhs_dilation=2 over edge-padded coarse cells)."""
    ci, co = w_u.shape[3], w_u.shape[4]
    c1 = jnp.asarray(_upconv_axis_table(), jnp.float32)
    w = w_u.astype(jnp.float32)
    k = jnp.einsum("aqrt,bsmu,cvnw,tuwio->abcqsviormn", c1, c1, c1, w)
    # index order: (kd,kh,kw, qd,qh,qw, ci, co, rd,rh,rw)
    k = k.transpose(0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 7)
    return k.reshape(5, 5, 5, 8 * ci, 8 * co).astype(w_u.dtype)


def _broadcast_sub_plane(plane, axis, sub):
    """On a boundary cell-plane (one cell thick along `axis`), set BOTH sub
    slots of that axis to the values of slot `sub` (fine edge replication
    at cell granularity).  Sub slots of axis a are contiguous channel runs
    of length 8C >> (a+1), repeated 2^a times — pure lane slices."""
    c8 = plane.shape[-1]
    block = c8 >> (axis + 1)
    parts = []
    for j in range(1 << axis):
        src = plane[..., (2 * j + sub) * block:(2 * j + sub + 1) * block]
        parts += [src, src]
    return jnp.concatenate(parts, axis=-1)


def edge_pad_cells(xp):
    """Append one edge-replicating cell per side per axis: the padded cell's
    both subs hold the boundary fine voxel (= clamped interpolation).

    Implemented as ONE fused zero-pad + six boundary-plane update-slices:
    the naive per-axis `concat([lo, xp, hi])` copies the whole tensor three
    times (~33 ms of the 266 ms b8 192^3 forward — experiments/v2_ablate.py);
    in-place plane writes on the padded buffer avoid that.  Plane values are
    computed on the ALREADY-PADDED neighbors (later-axis corners replicate
    transitively, exactly as the sequential concats did)."""
    pad = jnp.pad(xp, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
    for axis in range(3):
        n_ax = pad.shape[1 + axis]
        sl0 = [slice(None)] * 5
        sl0[1 + axis] = slice(1, 2)
        sl1 = [slice(None)] * 5
        sl1[1 + axis] = slice(n_ax - 2, n_ax - 1)
        lo = _broadcast_sub_plane(pad[tuple(sl0)], axis, 0)
        hi = _broadcast_sub_plane(pad[tuple(sl1)], axis, 1)
        dst0 = [slice(None)] * 5
        dst0[1 + axis] = slice(0, 1)
        dst1 = [slice(None)] * 5
        dst1[1 + axis] = slice(n_ax - 1, n_ax)
        pad = pad.at[tuple(dst0)].set(lo)
        pad = pad.at[tuple(dst1)].set(hi)
    return pad


def upconv_packed(x_aligned, wk):
    """Composed trilinear-2x-upsample + fine k=3/pad=1 conv, packed aligned
    coarse cells (N,Sc,Sc,Sc,8Ci) -> SHIFTED packed output at doubled fine
    resolution (N,2Sc+1,...,8Co).  wk from `pack_upconv_weights`.

    Interior-exact; one fine plane per face needs `_upconv_fix_faces`."""
    xe = edge_pad_cells(x_aligned)
    return lax.conv_general_dilated(
        xe, wk.astype(x_aligned.dtype),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        lhs_dilation=(2, 2, 2),
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(x_aligned, jnp.float32),
        precision=F._precision_for(x_aligned.dtype),
    ).astype(x_aligned.dtype)


def _coarse_fine_plane(xp, axis, fine_idx):
    """Extract fine plane `fine_idx` (0, 1, -2 or -1) of `axis` from packed
    cells, still packed over the other two axes: (N, A, B, 4C) in
    (sub_b, sub_c, c) channel order — via contiguous channel-run slices."""
    cells = xp.shape[1 + axis]
    cell, sub = divmod(fine_idx % (2 * cells), 2)
    sl = [slice(None)] * 5
    sl[1 + axis] = cell
    plane = xp[tuple(sl)]            # (N, A, B, 8C)
    c8 = xp.shape[-1]
    block = c8 >> (axis + 1)
    parts = [plane[..., (2 * j + sub) * block:(2 * j + sub + 1) * block]
             for j in range(1 << axis)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _unpack2_2d(p2):
    """(N, A, B, 4C) packed 2-D plane -> fine (N, 2A, 2B, C)."""
    n, a, b, c4 = p2.shape
    c = c4 // 4
    p = p2.reshape(n, a, b, 2, 2, c)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(n, 2 * a, 2 * b, c)


def _pack2_2d_shifted(x2):
    """Fine 2-D plane (N, Sf, Sf, C) -> SHIFTED packed (N, Sf/2+1, Sf/2+1,
    4C) (sub-major over the two axes, zero pads at fine -1 and Sf)."""
    x2 = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, a2, b2, c = x2.shape
    p = x2.reshape(n, a2 // 2, 2, b2 // 2, 2, c)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(n, a2 // 2, b2 // 2, 4 * c)


_DIMS2D = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def _conv2d_pad1(x2, w2):
    return lax.conv_general_dilated(
        x2, w2.astype(x2.dtype), (1, 1), [(1, 1)] * 2,
        dimension_numbers=_DIMS2D,
        preferred_element_type=F._preferred_for(x2, jnp.float32),
        precision=F._precision_for(x2.dtype),
    ).astype(x2.dtype)


def _upconv_face(x_aligned, w_u, axis, side, dequant_scale=None):
    """Exact up-path output on the fine boundary plane of `axis`
    (side 0: fine f=0; side 1: fine f=Sf-1), returned as a SHIFTED packed
    2-D plane (N, Sf/2+1, Sf/2+1, 4Co) over the other two axes.

    The two axis-taps are fused into ONE 2-D conv over channel-concatenated
    upsampled planes (resize_linear is linear, so the two `up` planes are
    combinations of two shared resized coarse planes).

    `dequant_scale`: when `x_aligned` is an int8 quantized tensor (the
    int8 inference path, models/unet_packed_q.py), its boundary planes are
    dequantized to `w_u.dtype` AFTER slicing (faces are thin, so the full
    tensor never materializes in float)."""
    dt = w_u.dtype if dequant_scale is not None else x_aligned.dtype

    def _plane(idx):
        p = _unpack2_2d(_coarse_fine_plane(x_aligned, axis, idx))
        if dequant_scale is not None:
            p = p.astype(dt) * dequant_scale
        return p

    if side == 0:
        planes, taps = (_plane(0), _plane(1)), (1, 2)
        # up[g=0] = p0 (clamped); up[g=1] = .75 p0 + .25 p1
        mix = ((1.0, 0.0), (0.75, 0.25))
    else:
        planes, taps = (_plane(-2), _plane(-1)), (0, 1)
        # up[Sf-2] = .25 p[-2] + .75 p[-1]; up[Sf-1] = p[-1] (clamped)
        mix = ((0.25, 0.75), (0.0, 1.0))
    sf_half = tuple(s * 2 for s in planes[0].shape[1:3])
    r = [jnp.asarray(F.resize_linear(p, sf_half), dt) for p in planes]
    ups = [a * r[0] + b * r[1] if b else a * r[0] for (a, b) in mix]
    u_cat = jnp.concatenate(ups, axis=-1)
    # after dropping the `axis` spatial dim each slice is (3, 3, Ci, Co)
    w_cat = jnp.concatenate(
        [w_u[tuple(t if i == axis else slice(None) for i in range(3))]
         for t in taps], axis=2)
    return _pack2_2d_shifted(_conv2d_pad1(u_cat, w_cat))


@functools.lru_cache(maxsize=None)
def _face_keep_mask(cells: int, ch: int, nbits: int, bit: int):
    """(cells, ch) keep-mask zeroing exactly the entries a face pair writes
    along one axis of a shifted tensor: first cell's sub==1 and last cell's
    sub==0 for the given sub `bit` of the `nbits` packed sub bits."""
    c = ch >> nbits
    sub = np.arange(ch) // c
    b = (sub >> (nbits - 1 - bit)) & 1
    m = np.ones((cells, ch), np.float32)
    m[0, b == 1] = 0.0
    m[-1, b == 0] = 0.0
    return m


def _embed_face(face, axis, side, out_shape):
    """Place a face plane (N, A, B, 4C) into a zero (shifted) full tensor:
    insert the written sub bit (r=1 for side 0, r=0 for side 1) into the
    channel dim and zero-pad the cell dim of `axis`.

    The cell-axis embed has two lowerings on this toolchain (A/B:
    experiments/face_embed_ab.py): `pad`, which XLA compiles to
    constant+dynamic-update-slice fusions (~32 ms/step across the 12 faces
    of the bf16 b2 192^3 train graph), and `bcast`
    (MRI_TPU_EMBED_FACE=bcast) — multiply by a one-hot cell mask with a
    stride-0 broadcast of the face, which can fuse into the surrounding
    add (its transpose is a multiply+reduce instead of a slice)."""
    n, a_sz, b_sz, c4 = face.shape
    r = 1 if side == 0 else 0
    pre = 1 << axis  # face sub bits ordered before the inserted bit
    f = face.reshape(n, a_sz, b_sz, pre, 1, c4 // pre)
    f = jnp.pad(f, [(0, 0)] * 4 + [(r, 1 - r)] + [(0, 0)])
    f = f.reshape(n, a_sz, b_sz, 2 * c4)
    f = jnp.expand_dims(f, 1 + axis)
    cells = out_shape[1 + axis]
    idx = 0 if side == 0 else cells - 1
    if os.environ.get("MRI_TPU_EMBED_FACE", "pad") == "bcast":
        onehot = np.zeros((cells,), np.float32)
        onehot[idx] = 1.0
        shape = [1, 1, 1, 1, 1]
        shape[1 + axis] = cells
        return f * jnp.asarray(onehot, f.dtype).reshape(shape)
    pad = [(0, 0)] * 5
    pad[1 + axis] = (idx, cells - 1 - idx)
    return jnp.pad(f, pad)


def upconv_fix_faces(ys, x_aligned, w_u, dequant_scale=None):
    """Overwrite the six boundary fine planes of `upconv_packed`'s output
    with exactly-computed values (fine-path zero-padding semantics).

    Arithmetic form: ys is multiplied by keep-masks zeroing every entry a
    face writes, then the (overlap-disjoint) embedded faces are added.
    The earlier per-face `.at[].set` writes compiled to latency-bound
    dynamic-update-slices (~2 ms each for 1.2 MB planes) plus full-tensor
    copies on this toolchain; this form fuses into elementwise passes.
    Overlaps (edges/corners) follow the original sequential-write
    semantics: the highest-axis face wins, so each lower-axis face is
    masked where any higher axis' faces cover."""
    c8 = ys.shape[-1]
    dtype = ys.dtype
    for a in range(3):
        m = jnp.asarray(_face_keep_mask(ys.shape[1 + a], c8, 3, a), dtype)
        shape = [1, 1, 1, 1, c8]
        shape[1 + a] = ys.shape[1 + a]
        ys = ys * m.reshape(shape)
    for a in range(3):
        others = [ax for ax in range(3) if ax != a]
        for side in (0, 1):
            face = _upconv_face(x_aligned, w_u, a, side,
                                dequant_scale).astype(dtype)
            for k, ax in enumerate(others):
                if ax > a:
                    mk = jnp.asarray(_face_keep_mask(
                        face.shape[1 + k], face.shape[-1], 2, k), dtype)
                    shape = [1, 1, 1, face.shape[-1]]
                    shape[1 + k] = face.shape[1 + k]
                    face = face * mk.reshape(shape)
            ys = ys + _embed_face(face, a, side, ys.shape)
    return ys


def _unpack_weights2_as_transpose(dwp, ci, co):
    """Adjoint of `pack_weights2_as`: packed-kernel cotangent
    (2,2,2,8Ci,8Co) -> fine (3,3,3,Ci,Co)."""
    a = jnp.asarray(_axis_table_as(), dwp.dtype)
    d6 = dwp.reshape(2, 2, 2, 2, 2, 2, ci, 2, 2, 2, co)
    # indices: (p_d,p_h,p_w, q_d,q_h,q_w, ci, r_d,r_h,r_w, co)
    return jnp.einsum("adef,bghi,cjkl,dgjehkmfiln->abcmn", a, a, a, d6)


@jax.custom_vjp
def upconv_core_hybrid(x_aligned, w_u):
    """Composed upsample+conv (`upconv_packed` over `pack_upconv_weights`)
    with a hand-rolled VJP.

    CONTRACT: only valid beneath `upconv_fix_faces` — the dw rule assumes
    the incoming cotangent is zero on the six face-plane entries (which
    fix_faces' keep-mask multiply guarantees).  There the composed forward
    equals the conceptual fine conv over the clamped upsample, so dw is
    computed as the cheap qgroup dw on `upsample2_packed(x)` instead of
    XLA's dense (5,5,5,8Ci,8Co) kernel gradient — the top-two ops of the
    bf16 b2 192^3 train profile (~38 ms of a 375 ms step, round 3)."""
    return upconv_packed(x_aligned, pack_upconv_weights(w_u))


def _upconv_hybrid_fwd(x_aligned, w_u):
    return upconv_core_hybrid(x_aligned, w_u), (x_aligned, w_u)


def _upconv_hybrid_bwd(res, g):
    x, w_u = res
    wk = pack_upconv_weights(w_u)

    def _core_from_x(xx):
        return lax.conv_general_dilated(
            edge_pad_cells(xx), wk.astype(xx.dtype),
            window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            lhs_dilation=(2, 2, 2), dimension_numbers=F.CONV3D_DIMS,
            preferred_element_type=F._preferred_for(xx, jnp.float32),
            precision=F._precision_for(xx.dtype)).astype(xx.dtype)

    (dx,) = jax.linear_transpose(
        _core_from_x, jax.ShapeDtypeStruct(x.shape, x.dtype))(g)
    up = upsample2_packed(x)
    up_pad = jnp.pad(up, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
    dwp = _dw_packed_qgroup(up_pad, g)
    ci, co = w_u.shape[3], w_u.shape[4]
    dw_u = _unpack_weights2_as_transpose(dwp, ci, co).astype(w_u.dtype)
    return dx, dw_u


upconv_core_hybrid.defvjp(_upconv_hybrid_fwd, _upconv_hybrid_bwd)


# ---------------------------------------------------------------------------
# stride-2 conv variants (the VoxResNet stem/downsample path, round 5)
#
# A fine k=3/s=2/p=1 conv maps fine grid S -> S/2.  Emitting the PACKED
# output directly as one dense (3,3,3,8Ci,8Co) conv costs 8x the fine FLOPs
# (for s=2 every (output-sub, tap) pair hits a DISTINCT input (cell, sub),
# so the dense kernel is only 12.5% populated).  Splitting by output
# sub-position instead gives 8 phase convolutions that share ONE
# (2,2,2,8Ci,Co) kernel — per phase the (tap -> window-cell, input-sub)
# map is sub-independent — and differ only in their per-axis padding.
# Dense-in-sub FLOPs: 64/27 of fine, the same ratio as the s=1 pack2 conv.
# Reference shapes: VoxResNet conv3d_1..conv3d_6,
# classification/models/cnn_model.py:43-101.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _axis_table_s2():
    """Per-axis table B[t, wpos, r]: output sub s's tap t reads, within its
    phase-s window [2X+s-1, 2X+s], window cell `wpos` sub `r`, with
    (wpos, r) = divmod(t + 1, 2) — independent of s."""
    b = np.zeros((3, 2, 2), np.float32)
    for t in range(3):
        wpos, r = divmod(t + 1, 2)
        b[t, wpos, r] = 1.0
    return b


def pack_weights2_s2(w):
    """Fine (3,3,3,Ci,Co) stride-2 kernel -> the shared phase kernel
    (2,2,2,8Ci,Co) for `conv3s2_packed_aa` (all 8 output sub-position
    phases share it; only the conv padding differs per phase)."""
    ci, co = w.shape[3], w.shape[4]
    b = jnp.asarray(_axis_table_s2(), w.dtype)
    wp = jnp.einsum("ade,bfg,chi,abcmn->dfhegimn", b, b, b, w)
    return wp.reshape(2, 2, 2, 8 * ci, co)


def conv3s2_packed_aa(xp_aligned, wk, bias=None):
    """Fine k=3/stride-2/pad-1 conv in packed space: ALIGNED packed input
    (N, S2, S2, S2, 8Ci) [fine res 2*S2] -> ALIGNED packed output
    (N, S2/2, ..., 8Co) [fine res S2].  S2 must be even.

    Executed as 8 stride-2 phase convolutions sharing `wk` (from
    `pack_weights2_s2`); phase s's window on each axis starts at cell
    2X+s-1, expressed as left padding (1-s).  Outputs concatenate
    sub-position-major — the packed channel order."""
    parts = []
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                y = lax.conv_general_dilated(
                    xp_aligned, wk.astype(xp_aligned.dtype),
                    window_strides=(2, 2, 2),
                    padding=[(1 - sd, 0), (1 - sh, 0), (1 - sw, 0)],
                    dimension_numbers=F.CONV3D_DIMS,
                    preferred_element_type=F._preferred_for(
                        xp_aligned, jnp.float32),
                    precision=F._precision_for(xp_aligned.dtype),
                ).astype(xp_aligned.dtype)
                parts.append(y)
    y = jnp.concatenate(parts, axis=-1)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _input_kernel_index_s2():
    """Scatter indices folding pack2_shifted into a fine s=2 stem conv:
    shifted output cell Q sub r (= fine output voxel 2Q-1+r) tap t reads
    fine input 4Q+2r+t-3, i.e. window index j = 2r+t of a k=5/stride-4/
    pad-(3,2) convolution."""
    src, dst = [], []
    for rd in range(2):
        for rh in range(2):
            for rw in range(2):
                so = (rd * 2 + rh) * 2 + rw
                for td in range(3):
                    for th in range(3):
                        for tw in range(3):
                            src.append((td, th, tw))
                            dst.append((2 * rd + td, 2 * rh + th,
                                        2 * rw + tw, so))
    return np.asarray(src), np.asarray(dst)


def pack_input_weights_s2(w):
    """Fine (3,3,3,Ci,Co) stride-2 kernel -> (5,5,5,Ci,8Co) for
    `conv_input_packed_s2`."""
    ci, co = w.shape[3], w.shape[4]
    src, dst = _input_kernel_index_s2()
    wp = jnp.zeros((5, 5, 5, ci, 8, co), w.dtype)
    wp = wp.at[dst[:, 0], dst[:, 1], dst[:, 2], :,
               dst[:, 3], :].set(w[src[:, 0], src[:, 1], src[:, 2]])
    return wp.reshape(5, 5, 5, ci, 8 * co)


def conv_input_packed_s2(x_fine, wp, bias=None):
    """Fine (N,S,S,S,Ci) -> SHIFTED packed (N,S/4+1,...,8Co) at fine res
    S/2, fusing a fine k=3/s=2/p=1 stem conv with pack2_shifted (one k=5/
    stride-4/pad-(3,2) conv).  The shifted pad voxels (fine -1 and S/2)
    hold the kernel's zero-pad extrapolation — callers must
    `zero_shifted_pads` before using batch statistics."""
    y = lax.conv_general_dilated(
        x_fine, wp.astype(x_fine.dtype),
        window_strides=(4, 4, 4), padding=[(3, 2)] * 3,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(x_fine, jnp.float32),
        precision=F._precision_for(x_fine.dtype),
    ).astype(x_fine.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _pack4_identity_kernel(ci: int):
    """(4,4,4,Ci,64Ci) identity space-to-depth kernel (stride-4 VALID):
    pack4 channel = (s4d, s4h, s4w, ci) sub-position-major."""
    k = np.zeros((4, 4, 4, ci, 64 * ci), np.float32)
    for a in range(4):
        for b in range(4):
            for c in range(4):
                sub = (a * 4 + b) * 4 + c
                for i in range(ci):
                    k[a, b, c, i, sub * ci + i] = 1.0
    return k


@functools.lru_cache(maxsize=None)
def _axis_table_s2_p4():
    """Per-axis table A[t, r, wpos, s4] for the pack4-input stem: shifted
    output sub r's tap t reads pack4 window cell `wpos` sub4 `s4`
    (j = 2r + t; j <= 2 -> (0, j+1), else (1, j-3))."""
    a = np.zeros((3, 2, 2, 4), np.float32)
    for t in range(3):
        for r in range(2):
            j = 2 * r + t
            if j <= 2:
                a[t, r, 0, j + 1] = 1.0
            else:
                a[t, r, 1, j - 3] = 1.0
    return a


def pack_input_weights_s2_p4(w):
    """Fine (3,3,3,Ci,Co) stride-2 stem kernel -> (2,2,2,64Ci,8Co) for
    `conv_input_packed_s2_p4` (consumes the pack4 layout)."""
    ci, co = w.shape[3], w.shape[4]
    a = jnp.asarray(_axis_table_s2_p4(), w.dtype)
    wp = jnp.einsum("arek,bsfl,ctgm,abcio->efgklmirsto", a, a, a, w)
    return wp.reshape(2, 2, 2, 64 * ci, 8 * co)


def conv_input_packed_s2_p4(x_fine, wk, bias=None):
    """Fine (N,S,S,S,Ci) -> SHIFTED packed (N,S/4+1,...,8Co) at fine res
    S/2: a fine k=3/s=2/p=1 stem conv as [identity pack4 conv (pure data
    movement, constant kernel — no dw) + one dense k=2/s=1/p=1 conv over
    the pack4 cells].

    Replaces the fused k=5/stride-4 form (`conv_input_packed_s2`) on TPU:
    that one lowers to the AllInputFeaturePackedInSublanes emitter at
    Ci=1 — 35.4 ms fwd+dw at 192^3 b10 vs 17.2 for this form
    (experiments/voxresnet_stem_ab.py, r5).  Every contraction here is
    fat (K = 8 * 64Ci); the only gradient term is this conv's dw.
    Shifted pad voxels hold zero-pad extrapolation — `zero_shifted_pads`
    before batch statistics."""
    ci = x_fine.shape[-1]
    k4 = jnp.asarray(_pack4_identity_kernel(ci), x_fine.dtype)
    xp4 = lax.conv_general_dilated(
        x_fine, k4, window_strides=(4, 4, 4), padding="VALID",
        dimension_numbers=F.CONV3D_DIMS,
        precision=F._precision_for(x_fine.dtype)).astype(x_fine.dtype)
    y = lax.conv_general_dilated(
        xp4, wk.astype(x_fine.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(x_fine, jnp.float32),
        precision=F._precision_for(x_fine.dtype)).astype(x_fine.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


def maxpool2_packed_cascade(xp):
    """maxpool2 via three lane-block max halvings + pack2 (no (…,8,C)
    sub-axis reshape of the full tensor)."""
    c8 = xp.shape[-1]
    c = c8 // 8
    x = jnp.maximum(xp[..., :4 * c], xp[..., 4 * c:])
    x = jnp.maximum(x[..., :2 * c], x[..., 2 * c:])
    x = jnp.maximum(x[..., :c], x[..., c:])
    return pack2(x)
