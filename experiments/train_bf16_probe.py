"""bf16-activation packed training: does it compile (fine-layout bf16
training crashed the helper in round 1) and how much does it save?"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()
F.set_precision_override("fast")
rng = np.random.default_rng(0)

for size, batch, dt in ((192, 1, jnp.bfloat16), (192, 2, jnp.bfloat16),
                        (64, 16, jnp.bfloat16)):
    try:
        model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                       out_channels_first_layer=8)
        state = create_train_state(model, torch_adamw(1e-3),
                                   jnp.zeros((1, 16, 16, 16, 1)))
        x = jnp.asarray(rng.normal(size=(batch, size, size, size, 1)), dt)
        y = jnp.asarray((rng.random((batch, size, size, size, 1)) > 0.5),
                        jnp.float32)
        t0 = time.perf_counter()
        state, loss = packed_seg_train_step(state, x, y)
        l0 = float(loss)
        c = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = packed_seg_train_step(state, x, y)
        l1 = float(loss)
        dtms = (time.perf_counter() - t0) / iters
        print(f"packed bf16 {size}^3 b{batch}: {dtms*1e3:.1f} ms/step "
              f"({batch/dtms:.2f} vol/s) loss {l0:.4f}->{l1:.4f} "
              f"(compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"packed bf16 {size}^3 b{batch} FAILED {type(e).__name__}: "
              f"{str(e)[:110]}", flush=True)
