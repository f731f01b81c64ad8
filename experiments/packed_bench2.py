"""Packed-v2 UNet end-to-end speed on the real TPU vs v1/fine baselines."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2

enable_compilation_cache()
DT = jnp.bfloat16
rng = np.random.default_rng(0)

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))


@jax.jit
def v2_fwd(v, x):
    return jnp.argmax(packed_unet_apply_v2(v, x), axis=-1).sum()


for b in (4, 8):
    x = jnp.asarray(rng.normal(size=(b, 192, 192, 192, 1)), DT)
    try:
        t0 = time.perf_counter()
        out = v2_fwd(variables, x)
        _ = int(out)
        compile_s = time.perf_counter() - t0
        iters = max(4, 32 // b)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = v2_fwd(variables, x)
        _ = int(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"packed-v2 fwd+argmax b{b} @192: {dt*1e3:9.2f} ms "
              f"-> {b/dt:.2f} vol/s (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"packed-v2 b{b} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
