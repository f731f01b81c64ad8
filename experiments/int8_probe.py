"""Go/no-go probe: does this toolchain lower int8 convs to the MXU at a
useful rate on the packed UNet shapes?

v5e's MXU does ~2x int8 MACs vs bf16 and int8 activations halve HBM
traffic, so a quantized packed inference path could beat the 44.6 vol/s
bf16 headline IF `lax.conv_general_dilated(int8, int8) -> int32` compiles
and runs near 2x.  This probes exactly that on the two production shapes
(first-scale s->a conv 64->128 and second-scale 128->256), plus the fused
dequant->PReLU->requant epilogue the real path would need.

Standalone-microbench caveat applies (see docs/PERFORMANCE.md): a win here
only licenses a full-graph A/B, not a swap.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/int8_probe.py
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
    jnp.asarray(out).block_until_ready()
    compile_s = time.perf_counter() - t0
    # axon transport: force a scalar readback to synchronize
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters, compile_s


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=out_dtype)


def probe(tag, b, s, ci, co):
    shape_x = (b, s, s, s, ci)
    shape_w = (2, 2, 2, ci, co)
    flops = 2 * b * (s - 1) ** 3 * ci * co * 8
    x8 = jnp.asarray(rng.integers(-127, 128, shape_x), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, shape_w), jnp.int8)
    xb = jnp.asarray(rng.normal(size=shape_x), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=shape_w), jnp.bfloat16)

    fb = jax.jit(lambda x, w: conv(x, w, jnp.float32).sum())
    tb, cb = timed(fb, xb, wb)
    print(f"{tag} bf16: {tb*1e3:7.2f} ms  {flops/tb/1e12:6.1f} TFLOP/s "
          f"(compile {cb:.0f}s)", flush=True)

    try:
        fi = jax.jit(lambda x, w: conv(x, w, jnp.int32).sum())
        ti, ci_s = timed(fi, x8, w8)
        print(f"{tag} int8: {ti*1e3:7.2f} ms  {flops/ti/1e12:6.1f} TOP/s "
              f"(compile {ci_s:.0f}s)  speedup {tb/ti:.2f}x", flush=True)
    except Exception as e:
        print(f"{tag} int8 FAILED: {type(e).__name__}: {e}", flush=True)
        return

    # fused epilogue shape-check: int32 -> dequant -> bias -> PReLU -> requant
    sw = jnp.asarray(rng.uniform(0.01, 0.1, (co,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(co,)), jnp.float32)

    def stepq(x, w):
        y = conv(x, w, jnp.int32).astype(jnp.float32) * sw + bias
        y = jnp.where(y >= 0, y, 0.25 * y)
        q = jnp.clip(jnp.round(y * 8.0), -127, 127).astype(jnp.int8)
        return q.astype(jnp.int32).sum()

    te, ce = timed(jax.jit(stepq), x8, w8)
    print(f"{tag} int8+epilogue: {te*1e3:7.2f} ms (compile {ce:.0f}s)",
          flush=True)


if __name__ == "__main__":
    probe("s1 64->128 (97^3 b8) ", 8, 97, 64, 128)
    probe("s2 128->256 (49^3 b8)", 8, 49, 128, 256)
