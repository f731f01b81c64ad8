"""Probe which Pallas k=2-packed-conv kernel structures this image's Mosaic
toolchain can compile (round-1 findings: >=3 overlapping-window dots crash,
minor-dim concat of <128-lane arrays crash, in-kernel dynamic_slice crash —
but those were probed on THIN (<128 lane) fader shapes; the packed layout
has 64..512 lanes, so re-probe).

Target op: packed k=2 VALID conv (N,D+1,H+1,W+1,Ci)->(N,D,H,W,Co),
Ci=64, Co=128 at the flagship enc0.conv2 shape (96^3 cells, b4).
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache

enable_compilation_cache()
DT = jnp.bfloat16
rng = np.random.default_rng(0)

# small probe shape first (fast compile), then the real shape
S_PROBE, S_REAL = 16, 96
CI, CO = 64, 128


def ref_conv(x, w):
    from jax import lax
    from mri_epilepsy_diagnosis_tpu.ops import functional as F
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(x.dtype)


def check(name, fn, x, w, iters=10, flops=None):
    try:
        t0 = time.perf_counter()
        out = fn(x, w)
        ref = ref_conv(x, w)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x, w)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        extra = f"  {flops/dt/1e12:7.1f} TFLOP/s" if flops else ""
        print(f"{name:46s} {dt*1e3:9.2f} ms{extra}  relerr {err/scale:.2e} "
              f"(compile {compile_s:.0f}s)", flush=True)
        return dt
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return float("nan")


# --------------------------------------------------------------------------
# Variant 1: grid over (batch*D, H tiles); block = (1, 2, TILE_H+1, W+1, Ci)
# -> 8 static-sliced dots accumulated in f32, one output block write.
# --------------------------------------------------------------------------


def _k8_kernel(x_ref, w_ref, o_ref, *, th, wv, ci, co):
    # x_ref: (1, 2, th+1, wv+1, ci); w_ref: (2,2,2,ci,co) flattened later
    acc = jnp.zeros((th * wv, co), jnp.float32)
    for td in range(2):
        for thh in range(2):
            for tww in range(2):
                xs = x_ref[0, td, thh:thh + th, tww:tww + wv, :]
                xm = xs.reshape(th * wv, ci)
                acc = acc + jnp.dot(xm, w_ref[td, thh, tww],
                                    preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.reshape(th, wv, co).astype(o_ref.dtype)


def conv_k8(x, w, tile_h=16):
    n, d1, h1, w1, ci = x.shape
    d, h, wv = d1 - 1, h1 - 1, w1 - 1
    co = w.shape[-1]
    grid = (n * d, h // tile_h)

    def xin(i, j):
        return (i // d, i % d, j, 0, 0)

    def xout(i, j):
        return (i // d, i % d, j, 0, 0)

    return pl.pallas_call(
        functools.partial(_k8_kernel, th=tile_h, wv=wv, ci=ci, co=co),
        out_shape=jax.ShapeDtypeStruct((n, d, h, wv, co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, tile_h + 1, w1, ci), xin,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 2, ci, co), lambda i, j: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_h, wv, co), xout,
                               memory_space=pltpu.VMEM),
    )(x, w)


# --------------------------------------------------------------------------
# Variant 2: same structure but 2 taps per kernel, 4 pallas calls summed
# (round-1 says 1-2 dots compile).
# --------------------------------------------------------------------------


def _k2_kernel(x_ref, w_ref, o_ref, *, th, wv, ci, co, thh, tww):
    acc = jnp.zeros((th * wv, co), jnp.float32)
    for td in range(2):
        xs = x_ref[0, td, thh:thh + th, tww:tww + wv, :]
        xm = xs.reshape(th * wv, ci)
        acc = acc + jnp.dot(xm, w_ref[td, 0, 0],
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.reshape(th, wv, co).astype(o_ref.dtype)


def conv_4x2(x, w, tile_h=16):
    n, d1, h1, w1, ci = x.shape
    d, h, wv = d1 - 1, h1 - 1, w1 - 1
    co = w.shape[-1]
    grid = (n * d, h // tile_h)
    acc = None
    for thh in range(2):
        for tww in range(2):
            part = pl.pallas_call(
                functools.partial(_k2_kernel, th=tile_h, wv=wv, ci=ci,
                                  co=co, thh=thh, tww=tww),
                out_shape=jax.ShapeDtypeStruct((n, d, h, wv, co), jnp.float32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 2, tile_h + 1, w1, ci),
                                 lambda i, j: (i // d, i % d, j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, 1, 1, ci, co),
                                 lambda i, j, _t=(thh, tww): (0, _t[0], _t[1],
                                                              0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, tile_h, wv, co),
                                       lambda i, j: (i // d, i % d, j, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(x, w)
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


# --------------------------------------------------------------------------
# Variant 3: fold the 8 taps into ONE dot: reshape x block rows so the dot
# K dimension covers (2 sublane-shifted rows x ci) at least for the W axis:
# im2col only along W inside VMEM via two static slices + concat on LAST dim
# (128-lane inputs -> concat gives 2*ci lanes; round-1 concat crash was for
# <128-lane arrays).
# --------------------------------------------------------------------------


def _k1cat_kernel(x_ref, w_ref, o_ref, *, th, wv, ci, co):
    acc = jnp.zeros((th * wv, co), jnp.float32)
    for td in range(2):
        for thh in range(2):
            a = x_ref[0, td, thh:thh + th, 0:wv, :]
            b = x_ref[0, td, thh:thh + th, 1:wv + 1, :]
            xc = jnp.concatenate([a, b], axis=-1)       # (th, wv, 2ci)
            xm = xc.reshape(th * wv, 2 * ci)
            acc = acc + jnp.dot(xm, w_ref[td, thh],
                                preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.reshape(th, wv, co).astype(o_ref.dtype)


def conv_cat(x, w, tile_h=16):
    n, d1, h1, w1, ci = x.shape
    d, h, wv = d1 - 1, h1 - 1, w1 - 1
    co = w.shape[-1]
    w2 = w.reshape(2, 2, 2, ci, co).transpose(0, 1, 2, 3, 4)
    w2 = jnp.concatenate([w2[:, :, 0], w2[:, :, 1]], axis=2)  # (2,2,2ci,co)
    grid = (n * d, h // tile_h)
    return pl.pallas_call(
        functools.partial(_k1cat_kernel, th=tile_h, wv=wv, ci=ci, co=co),
        out_shape=jax.ShapeDtypeStruct((n, d, h, wv, co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, tile_h + 1, w1, ci),
                         lambda i, j: (i // d, i % d, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 2 * ci, co), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_h, wv, co),
                               lambda i, j: (i // d, i % d, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, w2)


for s in (S_PROBE, S_REAL):
    print(f"== probe at S={s} ==", flush=True)
    x = jnp.asarray(rng.normal(size=(4, s + 1, s + 1, s + 1, CI)), DT)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, CI, CO)) * 0.1, DT)
    fl = 2 * 4 * s ** 3 * 8 * CI * CO
    check("V1 8 static-slice dots", jax.jit(conv_k8), x, w, flops=fl)
    check("V2 4 calls x 2 dots", jax.jit(conv_4x2), x, w, flops=fl)
    check("V3 W-concat, 4 dots of 2K", jax.jit(conv_cat), x, w, flops=fl)
    if s == S_REAL:
        for th in (8, 32, 48, 96):
            check(f"V1 tile_h={th}",
                  jax.jit(functools.partial(conv_k8, tile_h=th)), x, w,
                  flops=fl)
