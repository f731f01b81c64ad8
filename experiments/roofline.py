"""Chip roofline + conv-formulation shootout on the real TPU.

Round-2 finding to explain: the packed (space-to-depth) UNet forward is NOT
faster than the fine layout (9.3 vs 10.0 vol/s), even though it eliminates
the 8-16x lane-padding HBM tax.  Individual packed ops run at ~6.5% MFU
(conv) and 10-25x off HBM bandwidth (upsample/repack).  This script
measures (a) the chip's actual compute/BW ceilings through the axon relay,
(b) a menu of implementations for the packed k=2 conv, fine k=3 conv,
and the 2x trilinear upsample, to pick the fastest formulation.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.ops import packed as P

enable_compilation_cache()
DT = jnp.bfloat16


def timeit(name, fn, *args, iters=10, flops=None, bytes_=None):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        extra = ""
        if flops:
            extra += f"  {flops/dt/1e12:7.1f} TFLOP/s"
        if bytes_:
            extra += f"  {bytes_/dt/1e9:7.1f} GB/s"
        print(f"{name:44s} {dt*1e3:9.2f} ms{extra}", flush=True)
        return dt
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return float("nan")


rng = np.random.default_rng(0)

print("== ceilings ==", flush=True)
# compute peak: large square bf16 matmul
for m in (4096, 8192):
    a = jnp.asarray(rng.normal(size=(m, m)), DT)
    b = jnp.asarray(rng.normal(size=(m, m)), DT)
    timeit(f"matmul {m}x{m}x{m} bf16",
           jax.jit(lambda a, b: jnp.dot(a, b,
                                        preferred_element_type=jnp.float32)
                   .astype(DT)),
           a, b, flops=2 * m**3)
# HBM BW: elementwise on a big array (read + write)
big = jnp.asarray(rng.normal(size=(512, 1024, 1024)), DT)  # 1 GiB
timeit("copy+1 1GiB bf16", jax.jit(lambda x: x + 1.0), big,
       bytes_=2 * big.size * 2)
del big

# skinny matmuls at the conv's shapes: M=4*96^3, K in {64, 128, 512}
M = 4 * 96 ** 3
for k, n in ((64, 128), (128, 128), (512, 128), (128, 256), (256, 128)):
    a = jnp.asarray(rng.normal(size=(M, k)), DT)
    b = jnp.asarray(rng.normal(size=(k, n)), DT)
    timeit(f"matmul ({M},{k})@({k},{n})",
           jax.jit(lambda a, b: jnp.dot(a, b,
                                        preferred_element_type=jnp.float32)
                   .astype(DT)),
           a, b, flops=2 * M * k * n,
           bytes_=2 * (M * k + k * n + M * n))
    del a, b

print("== packed k=2 conv strategies (64->128 @ 96^3, b4) ==", flush=True)
TRUE_FLOPS = 2 * 4 * 96 ** 3 * 8 * 64 * 128
x97 = jnp.asarray(rng.normal(size=(4, 97, 97, 97, 64)), DT)
x96 = jnp.asarray(rng.normal(size=(4, 96, 96, 96, 64)), DT)
wp = jnp.asarray(rng.normal(size=(2, 2, 2, 64, 128)) * 0.1, DT)

# A: current conv_general_dilated VALID
timeit("A conv_general k2 VALID", jax.jit(
    lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)),
    x97, wp, flops=TRUE_FLOPS)

# B: 8 shifted einsum taps summed
def _conv_taps(x, w):
    acc = None
    for td in range(2):
        for th in range(2):
            for tw in range(2):
                xs = x[:, td:td + 96, th:th + 96, tw:tw + 96, :]
                y = jnp.einsum("ndhwc,co->ndhwo", xs, w[td, th, tw],
                               preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
    return acc.astype(DT)
timeit("B 8 shifted einsums", jax.jit(_conv_taps), x97, wp,
       flops=TRUE_FLOPS)

# C: explicit im2col concat + single matmul
def _conv_im2col(x, w):
    views = [x[:, td:td + 96, th:th + 96, tw:tw + 96, :]
             for td in range(2) for th in range(2) for tw in range(2)]
    xc = jnp.concatenate(views, axis=-1)           # (4,96^3,512)
    return jnp.einsum("ndhwk,ko->ndhwo", xc, w.reshape(512, 128),
                      preferred_element_type=jnp.float32).astype(DT)
timeit("C im2col concat + matmul", jax.jit(_conv_im2col), x97, wp,
       flops=TRUE_FLOPS)

# D: 2D-conv decomposition: 2 D-slabs of k=(2,2) 2D convs summed
DIMS2D = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
def _conv_2d_slabs(x, w):
    acc = None
    for td in range(2):
        xs = x[:, td:td + 96].reshape(4 * 96, 97, 97, 64)
        y = lax.conv_general_dilated(
            xs, w[td], (1, 1), "VALID", dimension_numbers=DIMS2D,
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc.astype(DT)
timeit("D 2x 2D k2 convs over D-slabs", jax.jit(_conv_2d_slabs), x97, wp,
       flops=TRUE_FLOPS)

# E: aligned k=3 conv (no repack needed; 3.375x fine FLOPs vs 2.37x)
w3 = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 128)) * 0.1, DT)
timeit("E conv_general k3 SAME (aligned)", jax.jit(
    lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)),
    x96, w3, flops=2 * 4 * 96 ** 3 * 27 * 64 * 128)

# F: fine-layout reference conv 8->16 @192 (what the packed conv replaces)
xf = jnp.asarray(rng.normal(size=(4, 192, 192, 192, 8)), DT)
wf = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)) * 0.1, DT)
timeit("F fine conv3d 8->16 @192", jax.jit(
    lambda x, w: F.conv3d(x, w, padding=1)), xf, wf,
    flops=2 * 4 * 192 ** 3 * 27 * 8 * 16)
del xf, wf

# G: deeper-layer packed conv 256->256 @ 48^3 (do fat channels run fast?)
x49 = jnp.asarray(rng.normal(size=(4, 49, 49, 49, 256)), DT)
wg = jnp.asarray(rng.normal(size=(2, 2, 2, 256, 256)) * 0.1, DT)
timeit("G conv_general k2 256->256 @48", jax.jit(
    lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)),
    x49, wg, flops=2 * 4 * 48 ** 3 * 8 * 256 * 256)
del x49, wg

print("== upsample strategies (fine 96->192 c32 == packed 48->96 c256) ==",
      flush=True)
xp48 = jnp.asarray(rng.normal(size=(4, 48, 48, 48, 256)), DT)
OUT_BYTES = 2 * (xp48.size + xp48.size * 8)
timeit("U0 current upsample2_packed", jax.jit(P.upsample2_packed), xp48,
       bytes_=OUT_BYTES)

xf96 = jnp.asarray(rng.normal(size=(4, 96, 96, 96, 32)), DT)
timeit("U1 fine resize_linear 96->192 c32", jax.jit(
    lambda x: F.resize_linear(x, (192, 192, 192), align_corners=False)),
    xf96, bytes_=OUT_BYTES)

# U2: per-axis matmul on fine layout, minor-dim contraction only
def _resize_axis_matmuls(x):
    for ax in range(3):
        m = jnp.asarray(F._linear_matrix(x.shape[1 + ax], 2 * x.shape[1 + ax],
                                         False), x.dtype)
        x = jnp.moveaxis(x, 1 + ax, -1)
        x = jnp.einsum("...i,oi->...o", x, m,
                       preferred_element_type=jnp.float32).astype(DT)
        x = jnp.moveaxis(x, -1, 1 + ax)
    return x
timeit("U2 fine per-axis einsum c32", jax.jit(_resize_axis_matmuls), xf96,
       bytes_=OUT_BYTES)

# U3: unpack -> fine resize -> pack
timeit("U3 unpack+resize+pack", jax.jit(
    lambda x: P.pack2(F.resize_linear(P.unpack2(x), (192, 192, 192),
                                      align_corners=False))),
    xp48, bytes_=OUT_BYTES)

print("== layout ops ==", flush=True)
timeit("pack2 fine 192 c16", jax.jit(P.pack2),
       jnp.asarray(rng.normal(size=(4, 192, 192, 192, 16)), DT),
       bytes_=2 * 2 * 4 * 192 ** 3 * 16)
timeit("unpack2 96 c128", jax.jit(P.unpack2),
       jnp.asarray(rng.normal(size=(4, 96, 96, 96, 128)), DT),
       bytes_=2 * 2 * 4 * 96 ** 3 * 128)
timeit("repack_shifted 96 c128", jax.jit(P.repack_shifted),
       jnp.asarray(rng.normal(size=(4, 96, 96, 96, 128)), DT),
       bytes_=2 * 2 * 4 * 96 ** 3 * 128)
