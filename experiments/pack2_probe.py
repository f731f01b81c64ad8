"""Probe space-to-depth (pack2) implementations on the TPU — the transpose
version runs at 4-50 GB/s (53 ms for the b8 192^3 c1 input)."""
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


def timeit(name, fn, *args, iters=8, bytes_=None):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        ref = P.pack2(args[0])
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        extra = f"  {bytes_/dt/1e9:7.1f} GB/s" if bytes_ else ""
        print(f"{name:44s} {dt*1e3:9.2f} ms{extra}  err {err:.1e} "
              f"(compile {compile_s:.0f}s)", flush=True)
        return dt
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return float("nan")


def pack2_slices(x):
    """8 strided slices + channel concat."""
    parts = [x[:, sd::2, sh::2, sw::2, :]
             for sd in range(2) for sh in range(2) for sw in range(2)]
    return jnp.concatenate(parts, axis=-1)


def pack2_conv(x):
    """Space-to-depth as an identity stride-2 conv."""
    c = x.shape[-1]
    w = np.zeros((2, 2, 2, c, 8 * c), np.float32)
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                s = (sd * 2 + sh) * 2 + sw
                for ci in range(c):
                    w[sd, sh, sw, ci, s * c + ci] = 1.0
    return lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), (2, 2, 2), "VALID",
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(x, jnp.float32),
    ).astype(x.dtype)


for (b, s, c) in ((8, 192, 1), (8, 96, 16)):
    x = jnp.asarray(rng.normal(size=(b, s, s, s, c)), DT)
    by = 2 * 2 * x.size
    print(f"== pack2 ({b},{s}^3,{c}) ==", flush=True)
    timeit("transpose (current)", jax.jit(P.pack2), x, bytes_=by)
    timeit("8 strided slices + concat", jax.jit(pack2_slices), x, bytes_=by)
    timeit("identity stride-2 conv", jax.jit(pack2_conv), x, bytes_=by)
    del x
