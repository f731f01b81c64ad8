"""TPU-first functional ops with PyTorch-compatible numerics.

Layout policy: all volumetric activations are **channels-last** —
``(N, D, H, W, C)`` — which is what XLA tiles best onto the TPU MXU/VPU.
Weights are ``(D, H, W, I, O)`` (``DHWIO``).  The reference's cuDNN calls are
NCDHW/OIDHW; the interop importer transposes once at load time
(`interop/torch_import.py`), so runtime never pays a layout tax.

Numerics match PyTorch where the reference depends on them (conv padding
conventions, transpose-conv as gradient-of-conv, Upsample align_corners
semantics, BatchNorm eps/momentum) — required for the `.pth` parity target
(BASELINE.md: Dice/AUC within 0.5%).
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _triple(v):
    if isinstance(v, (tuple, list)):
        if len(v) != 3:
            raise ValueError(f"expected length-3 tuple, got {v}")
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 2


CONV3D_DIMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)
CONV2D_DIMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


_PRECISION_OVERRIDE = None


def set_precision_override(mode):
    """Override the dtype-based contraction precision policy.

    mode: None (dtype policy), 'default'/'fast', 'high', 'highest'/'exact',
    or a lax.Precision.  The 'fast' override exists mainly for CPU test runs:
    this XLA CPU build compiles HIGHEST-precision conv *gradients*
    pathologically slowly (~25x), and training-convergence tests don't need
    bit-exact contractions.  On TPU the policy is moot for the perf path,
    which runs bf16 inputs (native MXU mode under any precision setting).
    """
    global _PRECISION_OVERRIDE
    if isinstance(mode, str):
        mode = {"default": lax.Precision.DEFAULT, "fast": lax.Precision.DEFAULT,
                "high": lax.Precision.HIGH, "highest": lax.Precision.HIGHEST,
                "exact": lax.Precision.HIGHEST}[mode]
    _PRECISION_OVERRIDE = mode


def _preferred_for(x, preferred):
    """Accumulation dtype: f32 for f32 inputs; for bf16 inputs keep the
    output in bf16 (MXU still accumulates f32 internally) — asking for an
    f32 conv *output* from bf16 operands breaks jax's conv VJP dtype rule
    (the dw conv would mix bf16 activations with f32 cotangents)."""
    if x.dtype == jnp.float32 or x.dtype == jnp.float64:
        return preferred
    return x.dtype


def _precision_for(dtype):
    """float32 inputs contract at HIGHEST (true f32 — required for `.pth`
    output parity); bfloat16 inputs use the native MXU bf16 x bf16 -> f32
    path, which is the performance mode."""
    if _PRECISION_OVERRIDE is not None:
        return _PRECISION_OVERRIDE
    if dtype == jnp.float32 or dtype == jnp.float64:
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# convolutions
# ---------------------------------------------------------------------------

def _conv3d_fwd_raw(x, w, stride, padding, dilation, groups=1):
    return lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        rhs_dilation=dilation,
        dimension_numbers=CONV3D_DIMS,
        feature_group_count=groups,
        preferred_element_type=_preferred_for(x, jnp.float32),
        precision=_precision_for(x.dtype),
    )


# XLA's autodiff rules for NDHWC convs are pathologically slow on this TPU
# toolchain (measured ~40x the forward): the dx conv uses input dilation and
# the dw conv becomes a huge-kernel conv that tiles terribly with thin
# channels.  The custom VJP below computes dx as a plain flipped-kernel conv
# (exact for stride 1; strided convs dilate the cotangent first) and dw as
# im2col patches + one MXU matmul — but ONLY while the patch tensor stays
# small: at scale the materialized patches plus XLA's transposed copy of
# the patch matrix dominate (0.5-1.9 GB copies per conv, 16 GB/step in the
# VoxResNet b10 graph), and XLA's own dw rule wins big.  Threshold A/B'd
# round 4 (experiments/dw_limit_ab.py, clf_roofline.py; r3 default was
# 3 GB): at 50 MB — VoxResNet 18.8 -> 31.6 vol/s, DilatedCNN 33.6 -> 46.5,
# AE 128^3 28.2 -> 35.6, fader alternation 25.3 -> 46.2, and even the
# fine 64^3 b16 patch-train step (the thin-channel case the im2col dw was
# originally built for) runs 2.2x faster (353 -> 162 ms/step).  Small
# convs below the threshold keep im2col.
_DW_PATCHES_BYTES_LIMIT = int(os.environ.get(
    "MRI_TPU_DW_LIMIT", 50_000_000))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv3d_vjp(x, w, stride, padding, dilation):
    return _conv3d_fwd_raw(x, w, stride, padding, dilation)


def _conv3d_vjp_fwd(x, w, stride, padding, dilation):
    return _conv3d_fwd_raw(x, w, stride, padding, dilation), (x, w)


def _conv3d_vjp_bwd(stride, padding, dilation, res, g):
    x, w = res
    k = w.shape[:3]
    ci, co = w.shape[3], w.shape[4]

    # ---- dx: conv of the (dilated) cotangent with the flipped kernel
    w_t = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)  # (k..., Co, Ci)
    # output of the dx conv must equal the input size:
    #   i = [(o-1)*s + 1] + pad_lo + pad_hi - d*(k-1)
    pad_lo = [dilation[i] * (k[i] - 1) - padding[i] for i in range(3)]
    pad_hi = [x.shape[1 + i] + padding[i]
              - ((g.shape[1 + i] - 1) * stride[i] + 1) for i in range(3)]
    dx = lax.conv_general_dilated(
        g, w_t,
        window_strides=(1, 1, 1),
        padding=list(zip(pad_lo, pad_hi)),
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=CONV3D_DIMS,
        preferred_element_type=_preferred_for(x, jnp.float32),
        precision=_precision_for(x.dtype),
    ).astype(x.dtype)

    # ---- dw: formulation depends on shape class (all exact):
    #  * dense (d=1), patches fit HBM: im2col patches + one MXU matmul
    #  * patches too big: XLA's dw rule
    #  * MRI_TPU_DILATED_DW=einsum opt-in: manual static-slice im2col for
    #    dilated convs.  Every replacement for XLA's dilated-dw paths was
    #    A/B'd in the DilatedCNN b10 graph and LOST (round 4,
    #    experiments/dilated_s2b_ab.py + clf_roofline.py): per-tap thin
    #    einsums 382 ms, manual static-slice im2col 305, per-tap einsums
    #    for the under-limit convs 324 — vs 297 for XLA's own lowerings
    #    (with the maxpool-compose fix), and 215 ms once the 50 MB patch
    #    threshold routes the big dilated dws to XLA's rule too.
    patches_bytes = (int(np.prod(g.shape[:4])) * int(np.prod(k)) * ci
                     * x.dtype.itemsize)
    dilated = dilation != (1, 1, 1)
    use_einsum = (dilated and
                  os.environ.get("MRI_TPU_DILATED_DW", "xla") == "einsum")
    if use_einsum:
        # manual im2col: static per-tap strided slices stacked, then ONE
        # MXU matmul — same memory as conv_general_dilated_patches but
        # without its while-loop lowering (per-tap einsums were also
        # tried: 27 thin vector-matrix reductions, lost by +26 ms)
        xpad = jnp.pad(x, ((0, 0),) + tuple((p, p) for p in padding)
                       + ((0, 0),))
        o_sp = g.shape[1:4]
        taps = []
        for td in range(k[0]):
            for th in range(k[1]):
                for tw in range(k[2]):
                    start = (td * dilation[0], th * dilation[1],
                             tw * dilation[2])
                    taps.append(lax.slice(
                        xpad,
                        (0, *start, 0),
                        (xpad.shape[0],
                         *[start[i] + (o_sp[i] - 1) * stride[i] + 1
                           for i in range(3)],
                         xpad.shape[4]),
                        strides=(1, *stride, 1)))
        pm = jnp.stack(taps, axis=4).reshape(-1, int(np.prod(k)) * ci)
        gm = g.reshape(-1, co)
        dw = lax.dot_general(pm, gm, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_precision_for(x.dtype))
        dw = dw.reshape(*k, ci, co).astype(w.dtype)
    elif patches_bytes <= _DW_PATCHES_BYTES_LIMIT:
        patches = lax.conv_general_dilated_patches(
            x, k, stride, [(p, p) for p in padding],
            rhs_dilation=dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=_precision_for(x.dtype),
        )
        pm = patches.reshape(-1, ci * int(np.prod(k)))
        gm = g.reshape(-1, co)
        # NB: contracting the leading dim via dot_general dimension
        # numbers instead of `pm.T @` was A/B'd (r4): XLA canonicalizes
        # both to the same transposed-copy form (VoxResNet b10 copy bill
        # identical at 16.18 GB, step 531 vs 532 ms) — kept as matmul.
        dw = jnp.matmul(pm.T, gm,
                        preferred_element_type=jnp.float32,
                        precision=_precision_for(x.dtype))
        dw = dw.reshape(ci, *k, co).transpose(1, 2, 3, 0, 4).astype(w.dtype)
    else:
        # fall back to XLA's dw rule when im2col patches would not fit HBM.
        # (The per-tap einsum variant for DENSE convs crashed this
        # platform's remote compiler at patch-training batch shapes;
        # XLA's rule is proven there.)
        _, dw_vjp = jax.vjp(
            lambda wv: _conv3d_fwd_raw(x, wv, stride, padding, dilation), w)
        (dw,) = dw_vjp(g)
    return dx, dw


_conv3d_vjp.defvjp(_conv3d_vjp_fwd, _conv3d_vjp_bwd)


# Space-to-batch formulation of the d=3 dilated convs (the DilatedCNN
# classifier, `classification/models/cnn_model.py:207-257`): output voxel o
# of a k=3/s=1/d=3/pad=3 conv reads inputs o + 3(t-1), all on o's mod-3
# phase grid — so the dilated conv decouples into 27 DENSE k=3/pad=1 convs,
# one per phase triple, batched as one conv on (N*27, S/3, ..., C).  A/B result
# (experiments/dilated_s2b_ab.py, bf16 b10 180^3 train): s2b 330.2 ms vs
# native 322.6 — XLA's dilated lowering is NOT the DilatedCNN bottleneck
# on this toolchain and the phase transposes cost more than they save, so
# the native path stays the default; opt in via MRI_TPU_DILATED=s2b.
_DILATED_MODE = os.environ.get("MRI_TPU_DILATED", "native")


def _dilated3_applicable(x, w, stride, padding, dilation, groups):
    return (_DILATED_MODE == "s2b" and groups == 1
            and dilation == (3, 3, 3) and stride == (1, 1, 1)
            and padding == (3, 3, 3) and w.shape[:3] == (3, 3, 3)
            and all(s % 3 == 0 for s in x.shape[1:4]))


def _conv3d_s2b3(x, w):
    """d=3/k=3/s=1/pad=3 conv via phase decomposition (exact)."""
    n, d, h, wd, c = x.shape
    xq = x.reshape(n, d // 3, 3, h // 3, 3, wd // 3, 3, c)
    xq = xq.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        n * 27, d // 3, h // 3, wd // 3, c)
    y = _conv3d_vjp(xq, w, (1, 1, 1), (1, 1, 1), (1, 1, 1))
    co = y.shape[-1]
    y = y.reshape(n, 3, 3, 3, d // 3, h // 3, wd // 3, co)
    return y.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(n, d, h, wd, co)


def conv3d(x, w, b=None, *, stride=1, padding=0, dilation=1, groups=1,
           preferred_dtype=jnp.float32):
    """3D convolution, torch `F.conv3d` semantics.

    x: (N, D, H, W, Cin)   w: (kD, kH, kW, Cin//groups, Cout)   b: (Cout,)
    `padding` is symmetric per-axis (int or 3-tuple), like torch.
    """
    stride, dilation = _triple(stride), _triple(dilation)
    padding = _triple(padding)
    if _dilated3_applicable(x, w, stride, padding, dilation, groups):
        y = _conv3d_s2b3(x, w)
    elif groups == 1:
        y = _conv3d_vjp(x, w, stride, padding, dilation)
    else:
        y = _conv3d_fwd_raw(x, w, stride, padding, dilation, groups)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d(x, w, b=None, *, stride=1, padding=0, dilation=1, groups=1,
           preferred_dtype=jnp.float32):
    """2D convolution, torch `F.conv2d` semantics. x: (N,H,W,C), w: (kH,kW,I,O)."""
    stride, dilation = _pair(stride), _pair(dilation)
    pad = [(p, p) for p in _pair(padding)]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=CONV2D_DIMS,
        feature_group_count=groups,
        preferred_element_type=_preferred_for(x, preferred_dtype),
        precision=_precision_for(x.dtype),
    )
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv3d_transpose(x, w, b=None, *, stride=1, padding=0, output_padding=0,
                     dilation=1, preferred_dtype=jnp.float32):
    """3D transposed convolution, torch `nn.ConvTranspose3d` semantics.

    Implemented as the mathematically equivalent fractionally-strided forward
    conv (input dilation = stride, spatially flipped kernel) so XLA lowers it
    straight onto the MXU.

    w: (kD, kH, kW, Cout, Cin) — i.e. the torch (Cin, Cout, kD, kH, kW) weight
    transposed to put Cout in the "I" slot *before* the flip/swap below.
    The importer stores transpose-conv weights already flipped+swapped as
    (kD,kH,kW, Cin, Cout) ready for `conv3d`; this function accepts the raw
    layout and does the flip itself.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    output_padding = _triple(output_padding)
    dilation = _triple(dilation)
    k = w.shape[:3]
    # flip spatial axes; (kD,kH,kW,Cout,Cin) -> (kD,kH,kW,Cin,Cout)
    w_eq = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    pad = [
        (dilation[i] * (k[i] - 1) - padding[i],
         dilation[i] * (k[i] - 1) - padding[i] + output_padding[i])
        for i in range(3)
    ]
    y = lax.conv_general_dilated(
        x, w_eq,
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=CONV3D_DIMS,
        preferred_element_type=_preferred_for(x, preferred_dtype),
        precision=_precision_for(x.dtype),
    )
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def dense(x, w, b=None):
    """x @ w (+ b) with dtype-aware precision (f32 -> HIGHEST)."""
    y = jnp.matmul(x, w.astype(x.dtype), precision=_precision_for(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _maxpool3d_blocks(x, kernel):
    """Non-overlapping maxpool (kernel == stride, dims divisible).

    Custom VJP because reduce_window's gradient (select_and_scatter) is ~50x
    slower than the forward on this TPU toolchain; the blocked formulation
    routes the cotangent with a reshape + compare (ties receive the gradient
    at every max position — measure-zero difference on real data).
    """
    n, d, h, w, c = x.shape
    kd, kh, kw = kernel
    xr = x.reshape(n, d // kd, kd, h // kh, kh, w // kw, kw, c)
    return xr.max(axis=(2, 4, 6))


def _maxpool3d_blocks_fwd(x, kernel):
    y = _maxpool3d_blocks(x, kernel)
    return y, (x, y)


def _maxpool3d_blocks_bwd(kernel, res, g):
    x, y = res
    n, d, h, w, c = x.shape
    kd, kh, kw = kernel
    xr = x.reshape(n, d // kd, kd, h // kh, kh, w // kw, kw, c)
    yb = y[:, :, None, :, None, :, None, :]
    gb = g[:, :, None, :, None, :, None, :]
    dx = jnp.where(xr == yb, gb, 0).reshape(x.shape)
    return (dx,)


_maxpool3d_blocks.defvjp(_maxpool3d_blocks_fwd, _maxpool3d_blocks_bwd)


def maxpool3d(x, kernel=2, stride=None, padding=0):
    """torch `nn.MaxPool3d` semantics (floor mode). x: (N,D,H,W,C)."""
    kernel = _triple(kernel)
    stride = kernel if stride is None else _triple(stride)
    padding = _triple(padding)
    if (kernel == stride and padding == (0, 0, 0)
            and all(x.shape[1 + i] % kernel[i] == 0 for i in range(3))):
        return _maxpool3d_blocks(x, kernel)
    if (kernel == (4, 4, 4) and stride == (2, 2, 2) and padding == (0, 0, 0)
            and os.environ.get("MRI_TPU_POOL42", "compose") == "compose"):
        # max over a k4/s2 window == max of the two adjacent non-overlapping
        # pairs: maxpool(2,1) o maxpool(2,2), exactly (max associativity,
        # bit-identical fwd AND grad).  The overlapping k=4 BACKWARD lowers
        # to a 64-element select_and_scatter costing 39.5 ms/step in the
        # DilatedCNN b10 train graph; composed, the inner backward is a
        # non-overlapping 8-element scatter and the outer runs on the
        # half-size grid — 322.6 -> 297.3 ms/step, 31.0 -> 33.6 vol/s
        # (experiments/clf_roofline.py + dilated_s2b_ab.py round 4).
        # Opt-out: MRI_TPU_POOL42=native.
        inner = maxpool3d(x, kernel=2, stride=2)
        return maxpool3d(inner, kernel=2, stride=1)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), *[(p, p) for p in padding], (0, 0)),
    )


def maxpool2d(x, kernel=2, stride=None, padding=0):
    kernel = _pair(kernel)
    stride = kernel if stride is None else _pair(stride)
    padding = _pair(padding)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), *[(p, p) for p in padding], (0, 0)),
    )


def avgpool3d(x, kernel=2, stride=None):
    kernel = _triple(kernel)
    stride = kernel if stride is None else _triple(stride)
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )
    return s / float(np.prod(kernel))


# ---------------------------------------------------------------------------
# resize — separable interpolation as matmuls (MXU-friendly)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool):
    """(out, in) 1-D linear interpolation matrix, PyTorch conventions."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # torch: single output sample takes source index 0 (align True)
        # or the half-pixel mapped index (align False)
        if align_corners or in_size == 1:
            m[0, 0] = 1.0
            return m
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = o * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (o + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    t = (src - i0).astype(np.float64)
    m[np.arange(out_size), i0] += (1.0 - t)
    m[np.arange(out_size), i1] += t
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int):
    """(out, in) nearest-neighbor matrix, torch `mode='nearest'` (floor)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    # torch computes the source index in float32; match its rounding
    scale = np.float32(in_size / out_size)
    src = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    m[np.arange(out_size), src] = 1.0
    return m


def _apply_axis_matrix(x, m, axis):
    """Contract axis `axis` of x with interpolation matrix m (out, in)."""
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x, jnp.asarray(m, x.dtype),
                   preferred_element_type=x.dtype,
                   precision=_precision_for(x.dtype))
    return jnp.moveaxis(y, -1, axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _resize_linear_core(x, out_spatial, align_corners):
    """Custom VJP: XLA's autodiff of the per-axis einsums transposes them
    into a badly-tiled layout (~100x slower than forward on TPU); the adjoint
    is just the same separable structure with transposed matrices."""
    for ax, out_sz in zip(range(1, x.ndim - 1), out_spatial):
        in_sz = x.shape[ax]
        if in_sz != out_sz:
            x = _apply_axis_matrix(
                x, _linear_matrix(in_sz, out_sz, align_corners), ax)
    return x


def _resize_linear_fwd(x, out_spatial, align_corners):
    return (_resize_linear_core(x, out_spatial, align_corners),
            tuple(x.shape[1:-1]))


def _resize_linear_bwd(out_spatial, align_corners, in_spatial, g):
    for ax, (in_sz, out_sz) in enumerate(zip(in_spatial, out_spatial)):
        if in_sz != out_sz:
            m = _linear_matrix(in_sz, out_sz, align_corners)
            g = _apply_axis_matrix(g, m.T, ax + 1)
    return (g,)


_resize_linear_core.defvjp(_resize_linear_fwd, _resize_linear_bwd)


def resize_linear(x, out_spatial: Sequence[int], *, align_corners: bool = False):
    """Tri/bi-linear resize of (N, *spatial, C), PyTorch Upsample semantics.

    Separable per-axis interpolation expressed as small dense matmuls, which
    XLA maps onto the MXU — far faster on TPU than gather-based resampling.
    """
    return _resize_linear_core(x, tuple(int(s) for s in out_spatial),
                               bool(align_corners))


def resize_nearest(x, out_spatial: Sequence[int]):
    """Nearest resize of (N, *spatial, C), torch `mode='nearest'` semantics."""
    spatial_axes = range(1, x.ndim - 1)
    for ax, out_sz in zip(spatial_axes, out_spatial):
        in_sz = x.shape[ax]
        if in_sz != out_sz:
            x = _apply_axis_matrix(x, _nearest_matrix(in_sz, out_sz), ax)
    return x


# ---------------------------------------------------------------------------
# normalization / activation
# ---------------------------------------------------------------------------

def prelu(x, a):
    """PReLU with torch shared-parameter semantics (`num_parameters=1`)."""
    a = jnp.asarray(a, x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def batch_norm(x, mean, var, gamma, beta, eps=1e-5):
    """Normalize channels-last x with given statistics (eval-mode BN)."""
    inv = lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * inv * gamma.astype(x.dtype) + beta.astype(x.dtype)


def instance_norm(x, gamma=None, beta=None, eps=1e-5):
    """torch `nn.InstanceNorm3d` (affine optional, no running stats).

    Normalizes each (N, C) slice over the spatial dims. x: (N, *spatial, C).
    """
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(y.dtype)
    if beta is not None:
        y = y + beta.astype(y.dtype)
    return y


def group_norm(x, num_groups, gamma=None, beta=None, eps=1e-5):
    """torch `nn.GroupNorm` semantics. x: (N, *spatial, C)."""
    n = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xg = x.reshape(n, -1, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    y = ((xg - mean) * lax.rsqrt(var + eps)).reshape(x.shape)
    if gamma is not None:
        y = y * gamma.astype(y.dtype)
    if beta is not None:
        y = y + beta.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# shape utilities
# ---------------------------------------------------------------------------

def pad_to(x, target_spatial, mode="constant", value=0.0):
    """Symmetrically pad spatial dims of (N, *spatial, C) up to target."""
    pads = [(0, 0)]
    for ax, tgt in zip(range(1, x.ndim - 1), target_spatial):
        extra = max(0, tgt - x.shape[ax])
        pads.append((extra // 2, extra - extra // 2))
    pads.append((0, 0))
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads, mode=mode, constant_values=value)


def crop_or_pad(x, target_spatial, value=0.0):
    """torchio CropOrPad semantics on (N, *spatial, C): center crop then pad.

    torchio crops/pads symmetrically around the volume center; extra odd voxel
    goes to the far side (matches torchio's floor-centered bounds).
    """
    # crop
    slices = [slice(None)]
    for ax, tgt in zip(range(1, x.ndim - 1), target_spatial):
        cur = x.shape[ax]
        if cur > tgt:
            start = (cur - tgt) // 2
            slices.append(slice(start, start + tgt))
        else:
            slices.append(slice(None))
    slices.append(slice(None))
    x = x[tuple(slices)]
    return pad_to(x, target_spatial, value=value)
