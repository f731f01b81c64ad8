"""Second int8 go/no-go probe: the remaining ops a quantized packed-v2
trunk needs, at their production shapes.

  - lhs_dilation=2 conv (the composed decoder upconv) in int8
  - dot_general int8 (the blockdiag head einsum)
  - reduce_max on int8 (maxpool2_packed) and the stride-2 identity conv
    pack (pack2 on int8)

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/int8_probe2.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)
from mri_epilepsy_diagnosis_tpu.ops import functional as F

enable_compilation_cache()
wait_for_backend()
rng = np.random.default_rng(0)


def timed(fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters, compile_s


def upconv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=F.CONV3D_DIMS, preferred_element_type=out_dtype)


def run(tag, fn8, fnb, args8, argsb, ok_check=None):
    tb, cb = timed(fnb, *argsb)
    print(f"{tag} bf16: {tb*1e3:7.2f} ms (compile {cb:.0f}s)", flush=True)
    try:
        ti, ci = timed(fn8, *args8)
        extra = ""
        if ok_check is not None:
            extra = "  " + ok_check()
        print(f"{tag} int8: {ti*1e3:7.2f} ms (compile {ci:.0f}s)  "
              f"speedup {tb/ti:.2f}x{extra}", flush=True)
    except Exception as e:
        print(f"{tag} int8 FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    b = 8
    # dec0 upconv: edge-padded coarse cells (b,50,50,50,256) -> (5,5,5,256,128)
    x8 = jnp.asarray(rng.integers(-127, 128, (b, 50, 50, 50, 256)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (5, 5, 5, 256, 128)), jnp.int8)
    xb, wb = x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)
    run("upconv dec0 (50^3 b8) ",
        jax.jit(lambda x, w: upconv(x, w, jnp.int32).sum()),
        jax.jit(lambda x, w: upconv(x, w, jnp.float32).sum()),
        (x8, w8), (xb, wb))

    # blockdiag head dot: (b,96,96,96,128) x (128,16)
    h8 = jnp.asarray(rng.integers(-127, 128, (b, 96, 96, 96, 128)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (128, 16)), jnp.int8)
    hb, kb = h8.astype(jnp.bfloat16), k8.astype(jnp.bfloat16)
    run("head dot (96^3 b8)    ",
        jax.jit(lambda x, w: jnp.einsum(
            "ndhwi,io->ndhwo", x, w,
            preferred_element_type=jnp.int32).sum()),
        jax.jit(lambda x, w: jnp.einsum(
            "ndhwi,io->ndhwo", x, w,
            preferred_element_type=jnp.float32).sum()),
        (h8, k8), (hb, kb))

    # maxpool2_packed: sub-axis reshape max + stride-2 identity-conv pack
    from mri_epilepsy_diagnosis_tpu.ops import packed as P

    def pool(x):
        n, d, h, w, c8 = x.shape
        pooled = x.reshape(n, d, h, w, 8, c8 // 8).max(axis=4)
        return P.pack2(pooled)

    p8 = jnp.asarray(rng.integers(-127, 128, (b, 96, 96, 96, 128)), jnp.int8)
    pb = p8.astype(jnp.bfloat16)
    run("maxpool2 (96^3 b8)    ",
        jax.jit(lambda x: pool(x).astype(jnp.int32).sum()),
        jax.jit(lambda x: pool(x).astype(jnp.float32).sum()),
        (p8,), (pb,))
