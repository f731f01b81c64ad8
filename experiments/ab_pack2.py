"""A/B the pack2/unpack2 implementation INSIDE the full v2 forward.

Standalone probes said conv-based space-to-depth is 6-10x faster than the
transpose, but swapping it in dropped the fused forward 32.4 -> 25.1 vol/s
(b8).  Hypothesis: XLA folds the standalone transpose into adjacent conv
layouts inside the full graph.  This measures both in context.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models import unet_packed as U
from mri_epilepsy_diagnosis_tpu.ops import packed as P

enable_compilation_cache()
DT = jnp.bfloat16
rng = np.random.default_rng(0)

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

conv_pack2, conv_unpack2 = P.pack2, P.unpack2


def tr_pack2(x):
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def tr_unpack2(y):
    n, d2, h2, w2, c8 = y.shape
    c = c8 // 8
    y = y.reshape(n, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d2, 2 * h2, 2 * w2, c)


def run(name, pack2, unpack2, b=8, iters=8):
    P.pack2 = pack2
    P.unpack2 = unpack2
    fwd = jax.jit(lambda v, x: jnp.argmax(
        U.packed_unet_apply_v2(v, x), axis=-1).sum())
    x = jnp.asarray(rng.normal(size=(b, 192, 192, 192, 1)), DT)
    try:
        t0 = time.perf_counter()
        int(fwd(variables, x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, x)
        int(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:36s} {dt*1e3:9.2f} ms -> {b/dt:.2f} vol/s "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)


run("conv pack2 + conv unpack2", conv_pack2, conv_unpack2)
run("transpose pack2 + conv unpack2", tr_pack2, conv_unpack2)
run("conv pack2 + transpose unpack2", conv_pack2, tr_unpack2)
run("transpose pack2 + transpose unpack2", tr_pack2, tr_unpack2)
