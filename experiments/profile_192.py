"""Per-stage timing of the 192^3 ocfl=8 UNet forward on the real TPU.

Finds where the inference time goes (VERDICT r1 weak #2: MFU ~3.6%).
Each stage of the flagship forward is timed as its own jit'd graph;
batch sweep of the full forward included.  Timing forces a scalar
readback (block_until_ready doesn't sync on the axon transport).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.models import UNet3D

enable_compilation_cache()

DT = jnp.bfloat16


def timeit(name, fn, *args, iters=10):
    try:
        t_c0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1e3:9.2f} ms  (compile {compile_s:.1f}s)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return float("nan")


def vol(b, s, c, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(b, s, s, s, c)),
                       DT)


def conv_probe(b, s, ci, co, k=3, pad=1):
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(k, k, k, ci, co)) * 0.1, DT)
    x = vol(b, s, ci)
    f = jax.jit(lambda x, w: F.conv3d(x, w, padding=pad))
    return f, (x, w)


B = 4
print(f"== per-stage probes, batch={B}, bf16 ==", flush=True)
# thunks: allocate each stage's inputs lazily and free them right after —
# materializing all of them at once exhausts HBM (dec1.conv1 alone is 2.7GB)
stages = [
    ("enc0.conv1 1->8 @192",  lambda: conv_probe(B, 192, 1, 8)),
    ("enc0.conv2 8->16 @192", lambda: conv_probe(B, 192, 8, 16)),
    ("maxpool 192->96 c16",   lambda: (jax.jit(lambda x: F.maxpool3d(x, 2)),
                                       (vol(B, 192, 16),))),
    ("enc1.conv1 16->16 @96", lambda: conv_probe(B, 96, 16, 16)),
    ("enc1.conv2 16->32 @96", lambda: conv_probe(B, 96, 16, 32)),
    ("maxpool 96->48 c32",    lambda: (jax.jit(lambda x: F.maxpool3d(x, 2)),
                                       (vol(B, 96, 32),))),
    ("bot.conv1 32->32 @48",  lambda: conv_probe(B, 48, 32, 32)),
    ("bot.conv2 32->64 @48",  lambda: conv_probe(B, 48, 32, 64)),
    ("resize 48->96 c64",     lambda: (jax.jit(lambda x: F.resize_linear(
        x, (96, 96, 96))), (vol(B, 48, 64),))),
    ("dec0.conv1 96->32 @96", lambda: conv_probe(B, 96, 96, 32)),
    ("dec0.conv2 32->32 @96", lambda: conv_probe(B, 96, 32, 32)),
    ("resize 96->192 c32",    lambda: (jax.jit(lambda x: F.resize_linear(
        x, (192, 192, 192))), (vol(B, 96, 32),))),
    ("dec1.conv1 48->16 @192", lambda: conv_probe(B, 192, 48, 16)),
    ("dec1.conv2 16->16 @192", lambda: conv_probe(B, 192, 16, 16)),
    ("classifier 16->2 @192", lambda: conv_probe(B, 192, 16, 2, k=1, pad=0)),
    ("argmax c2 @192",        lambda: (jax.jit(lambda x: jnp.argmax(
        x, -1).sum()), (vol(B, 192, 2),))),
]
total = 0.0
for name, make in stages:
    f, args = make()
    dt = timeit(name, f, *args)
    del f, args
    if dt == dt:
        total += dt
if total:
    print(f"{'SUM of stages':34s} {total*1e3:9.2f} ms "
          f"({B/total:.2f} vol/s)", flush=True)

print("== full forward batch sweep ==", flush=True)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
fwd = jax.jit(lambda v, x: jnp.argmax(model.apply(v, x), -1).sum())
for b in (4, 8, 16):
    x = vol(b, 192, 1)
    dt = timeit(f"full fwd b={b} @192 bf16", fwd, variables, x,
                iters=max(4, 32 // b))
    if dt == dt:
        print(f"   -> {b/dt:.2f} vol/s", flush=True)
