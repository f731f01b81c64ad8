"""Probe 2: XLA building blocks for the packed-v2 UNet redesign.

(a) lhs_dilated (transposed) conv speed — the decoder upsample+conv fusion
    hinges on XLA rewriting lhs_dilation into per-parity convs on TPU.
(b) maxpool variants.
(c) a->s conv (k=2, padding 1) speed == s->a conv (A in roofline.py)?
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
rng = np.random.default_rng(0)


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
        print(f"{name:48s} {dt*1e3:9.2f} ms{extra} (compile {compile_s:.0f}s)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{name:48s} FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return float("nan")


# (a) transposed conv: dec1's fused up-path shape — coarse (48^3,256)
# aligned cells -> shifted (97^3,128).  Kernel k=5 dilated, dense.
xc = jnp.asarray(rng.normal(size=(4, 48, 48, 48, 256)), DT)
w5 = jnp.asarray(rng.normal(size=(5, 5, 5, 256, 128)) * 0.05, DT)
def tconv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(3, 3)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)
# effective FLOPs: per output, ~(5//2+1)^3... count real taps: per axis
# kernel positions hitting non-holes = 2 or 3 of 5 -> use 2.5^3 avg
timeit("tconv lhs_dil=2 k5 256->128 (->97^3)", jax.jit(tconv), xc, w5,
       flops=int(2 * 4 * 97 ** 3 * (2.5 ** 3) * 256 * 128))

# smaller dec0 variant: (24^3,512) -> (49^3,256)
xc0 = jnp.asarray(rng.normal(size=(4, 24, 24, 24, 512)), DT)
w50 = jnp.asarray(rng.normal(size=(5, 5, 5, 512, 256)) * 0.05, DT)
timeit("tconv lhs_dil=2 k5 512->256 (->49^3)", jax.jit(tconv), xc0, w50,
       flops=int(2 * 4 * 49 ** 3 * (2.5 ** 3) * 512 * 256))

# (c) a->s conv: k2 pad1 vs k2 VALID (roofline A: 24.4ms)
x96 = jnp.asarray(rng.normal(size=(4, 96, 96, 96, 64)), DT)
wp = jnp.asarray(rng.normal(size=(2, 2, 2, 64, 128)) * 0.1, DT)
timeit("conv k2 pad1 64->128 (->97^3)", jax.jit(
    lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)),
    x96, wp, flops=2 * 4 * 97 ** 3 * 8 * 64 * 128)

# k2 conv at bigger batch to amortize: b8
x96b = jnp.asarray(rng.normal(size=(8, 97, 97, 97, 64)), DT)
timeit("conv k2 VALID 64->128 b8", jax.jit(
    lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)),
    x96b, wp, flops=2 * 8 * 96 ** 3 * 8 * 64 * 128)
del x96b

# (b) maxpool variants at enc0 output: (96^3, 128) packed -> (48^3, 128)
xp = jnp.asarray(rng.normal(size=(4, 96, 96, 96, 128)), DT)
BYTES = 2 * (xp.size + xp.size // 8)
timeit("pool v1 (reshape-8C + pack2)", jax.jit(P.maxpool2_packed), xp,
       bytes_=BYTES)

def pool_cascade(x):
    c8 = x.shape[-1]
    c = c8 // 8
    x = jnp.maximum(x[..., :4 * c], x[..., 4 * c:])
    x = jnp.maximum(x[..., :2 * c], x[..., 2 * c:])
    x = jnp.maximum(x[..., :c], x[..., c:])
    return P.pack2(x)
timeit("pool v2 (lane-block max cascade)", jax.jit(pool_cascade), xp,
       bytes_=BYTES)

def pool_rw(x):  # reduce_window on the packed layout? needs sub semantics --
    # only correct because window==sub-block: do fine unpack->pool->pack
    xf = P.unpack2(x)
    return P.pack2(F.maxpool3d(xf, 2))
timeit("pool v3 (unpack+maxpool3d+pack)", jax.jit(pool_rw), xp, bytes_=BYTES)

# the input fusion probe: fine (192^3,1) -> shifted packed via k4 s2 conv
xf1 = jnp.asarray(rng.normal(size=(4, 192, 192, 192, 1)), DT)
w4 = jnp.asarray(rng.normal(size=(4, 4, 4, 1, 64)) * 0.1, DT)
timeit("input k4 s2 conv 1->64 (->97^3)", jax.jit(
    lambda x, w: lax.conv_general_dilated(
        x, w, (2, 2, 2), [(2, 2)] * 3, dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.float32).astype(DT)),
    xf1, w4, flops=2 * 4 * 97 ** 3 * 64 * 1 * 64)
