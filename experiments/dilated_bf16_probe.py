"""DilatedCNN 180^3 training in bf16 mixed precision (VERDICT r2 item 8:
reference batch 10 at >= 30 vol/s, or a recorded analysis).

f32 status: flat b10 crashes the remote compiler; accum micro=5 reaches
20.0 vol/s; flat b4 19.5.  This probes whether bf16 activations lift the
rate the way they did for the UNet (3.6 -> 5.3 vol/s).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import DilatedCNN
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.accum import class_train_step_accum
from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()
F.set_precision_override("fast")
rng = np.random.default_rng(2)
key = jax.random.key(0)
SIZE = 180

for (b, micro) in ((4, 0), (10, 5), (10, 2), (10, 0)):
    model = DilatedCNN(input_shape=(SIZE,) * 3)
    st = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                            jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    x = jnp.asarray(rng.normal(size=(b, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)

    def one(st):
        if micro:
            st, loss, _ = class_train_step_accum(st, x, y, key, micro=micro)
        else:
            st, loss, _ = _class_step(st, x, y, key, True)
        return st, loss

    try:
        t0 = time.perf_counter()
        st, loss = one(st)
        l0 = float(loss)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            st, loss = one(st)
        l1 = float(loss)
        dt = (time.perf_counter() - t0) / iters
        print(f"bf16 b{b} micro={micro}: {dt*1e3:.1f} ms/step "
              f"({b/dt:.2f} vol/s) loss {l0:.4f}->{l1:.4f} compile {c:.0f}s",
              flush=True)
    except Exception as e:
        print(f"bf16 b{b} micro={micro} FAILED {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
