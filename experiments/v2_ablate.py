"""Marginal in-context cost of each v2 forward component, by ablation:
time the FULL fused graph with one piece removed (standalone stage timings
mislead — XLA folds layouts across ops; see ab_pack2.py).

Patching trick: jit traces on the FIRST CALL, so holding a mock.patch
around the compile call bakes the ablation into the compiled graph; later
timed calls reuse it with the patch released.
"""
import contextlib
import os
import sys
import time
from unittest import mock

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
B, S = 8, 192

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
x = jnp.asarray(rng.normal(size=(B, S, S, S, 1)), DT)


def bench(name, fn, arg, patch=None, iters=10, b=B):
    try:
        t0 = time.perf_counter()
        with (patch if patch is not None else contextlib.nullcontext()):
            float(fn(variables, arg))  # trace+compile under the ablation
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, arg)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1e3:8.2f} ms  {b/dt:6.2f} vol/s "
              f"(compile {c:.0f}s)", flush=True)
        return dt
    except Exception as e:
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return float("nan")


def full_fn():
    return jax.jit(lambda v, a: jnp.argmax(
        U.packed_unet_apply_v2(v, a), axis=-1).sum())


bench("full v2 (argmax fine)", full_fn(), x)

bench("no final unpack2 (packed argmax)",
      jax.jit(lambda v, a: jnp.argmax(
          U.packed_unet_apply_v2(v, a).reshape(
              B, S // 2, S // 2, S // 2, 8, 2), axis=-1).sum()),
      x, patch=mock.patch.object(P, "unpack2", lambda y: y))

bench("no upconv_fix_faces", full_fn(), x,
      patch=mock.patch.object(P, "upconv_fix_faces",
                              lambda ys, xp, w: ys))

bench("no zero_shifted_pads", full_fn(), x,
      patch=mock.patch.object(P, "zero_shifted_pads", lambda y: y))

bench("no edge_pad_cells", full_fn(), x,
      patch=mock.patch.object(P, "edge_pad_cells",
                              lambda xp: jnp.pad(
                                  xp, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))))

xp_pre = jax.jit(P.pack2)(x)
bench("input pre-packed", full_fn(), xp_pre,
      patch=mock.patch.object(P, "pack2", lambda a: a))

x16 = jnp.asarray(rng.normal(size=(16, S, S, S, 1)), DT)
bench("full v2 batch 16", full_fn(), x16, b=16)
