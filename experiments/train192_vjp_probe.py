"""192^3 packed train step with the custom qgroup-dw conv VJPs (round 3).

Measures b1 / b2(remat) / b4(remat) / b4 / bf16-b1 — the round-2 frontier
was b1 f32 2.77 vol/s, with b4 crashing the remote compiler and bf16 train
compiles hanging; the custom VJP replaces exactly the XLA gradient graphs
implicated in both.
"""
import os
import signal
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
F.set_precision_override("fast")  # bench.py's train-bench precision mode
rng = np.random.default_rng(0)

CASES = [
    ("f32 b1", jnp.float32, 1, False),
    ("f32 b2 remat", jnp.float32, 2, True),
    ("f32 b2", jnp.float32, 2, False),
    ("f32 b4 remat", jnp.float32, 4, True),
    ("f32 b4", jnp.float32, 4, False),
    ("bf16 b1", jnp.bfloat16, 1, False),
]
only = sys.argv[1:] if len(sys.argv) > 1 else None

for name, dt, batch, remat in CASES:
    if only and not any(o in name for o in only):
        continue
    try:
        model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                       out_channels_first_layer=8)
        state = create_train_state(model, torch_adamw(1e-3),
                                   jnp.zeros((1, 16, 16, 16, 1)))
        if dt == jnp.bfloat16:
            state = state.replace(params=jax.tree.map(
                lambda p: p.astype(jnp.bfloat16), state.params))
        x = jnp.asarray(rng.normal(size=(batch, 192, 192, 192, 1)), dt)
        y = jnp.asarray((rng.random((batch, 192, 192, 192, 1)) > 0.5),
                        jnp.float32)
        t0 = time.perf_counter()
        state, loss = packed_seg_train_step(state, x, y, remat=remat)
        l0 = float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            state, loss = packed_seg_train_step(state, x, y, remat=remat)
        l1 = float(loss)
        dt_s = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt_s*1e3:.1f} ms/step ({batch/dt_s:.2f} vol/s) "
              f"loss {l0:.4f}->{l1:.4f} (compile {compile_s:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{name} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
