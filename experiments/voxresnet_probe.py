"""VoxResNet 192^3 training throughput — the one BASELINE config bench.py
does not yet cover (transfer epoch 60.1 s on a P100,
`classification/transfer/full_sample_classification.ipynb` cell 21:
input (192,192,192), n_filters=32, stride=2, n_blocks=4, batch 10,
~126 soloviev volumes => ~2.1 vol/s including validation).

Probes which (batch, dtype, accum) configs this platform's remote compiler
accepts and how fast the FULL fwd+bwd step runs (harder than the
reference's frozen-backbone transfer step).  Each config runs in-process;
a compiler crash ends the run, so order goes safest-first.

Run on the TPU:  python experiments/voxresnet_probe.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)
from mri_epilepsy_diagnosis_tpu.models import VoxResNet
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.accum import class_train_step_accum
from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

if os.environ.get("MRI_TPU_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
else:
    wait_for_backend()
enable_compilation_cache()
F.set_precision_override("fast")
rng = np.random.default_rng(3)
key = jax.random.key(0)
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 192

for (b, micro, dt) in ((4, 0, jnp.bfloat16), (10, 0, jnp.bfloat16),
                       (10, 5, jnp.bfloat16), (10, 0, jnp.float32)):
    dtname = jnp.dtype(dt).name
    model = VoxResNet(input_shape=(SIZE,) * 3, n_filters=32, stride=2,
                      n_blocks=4, dropout=0.5, n_fc_units=192)
    st = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                            jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    x = jnp.asarray(rng.normal(size=(b, SIZE, SIZE, SIZE, 1)), dt)
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
        dt_s = (time.perf_counter() - t0) / iters
        print(f"{dtname} b{b} micro={micro}: {dt_s*1e3:.1f} ms/step "
              f"({b/dt_s:.2f} vol/s) loss {l0:.4f}->{l1:.4f} "
              f"compile {c:.0f}s", flush=True)
    except Exception as e:
        print(f"{dtname} b{b} micro={micro} FAILED {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
