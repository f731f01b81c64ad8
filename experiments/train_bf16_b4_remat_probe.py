"""bf16 packed 192^3 train: does remat or flat b4 beat the b2 headline?

Motivation (experiments/copy_hunt.py, r3): the bf16 b2 composed step is
375 ms with ~160 ms of pure data movement — 78.6 ms layout-conversion
copies (32 GB/step) around the shifted-conv jvp chains + 32.6 ms face-fix
DUS fusions + slices/reshapes.  The layouts are XLA-internal, but (a)
per-block remat swaps saved-activation layout copies for recompute, and
(b) bf16 lifted the DilatedCNN flat-b10 compiler box (f32 crashes), so the
f32-era "packed seg b4 crashes the compiler" box may be gone in bf16 too.

Run on the TPU:  python experiments/train_bf16_b4_remat_probe.py
"""
import functools
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
SIZE = 192
rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)

CONFIGS = (  # (batch, dec_up, remat)
    (2, "composed", True),    # headline config + remat
    (4, "composed", False),   # the f32-era compiler box, in bf16
    (4, "composed", True),
    (4, "hybrid", False),
)

for b, dec_up, remat in CONFIGS:
    state = create_train_state(model, torch_adamw(1e-3),
                               jnp.zeros((1, 16, 16, 16, 1)))
    x = jnp.asarray(rng.normal(size=(b, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
    y = jnp.asarray((rng.random(size=(b, SIZE, SIZE, SIZE, 1)) > 0.5),
                    jnp.float32)
    step = functools.partial(packed_seg_train_step, dec_up=dec_up,
                             remat=remat)
    try:
        t0 = time.perf_counter()
        state, loss = step(state, x, y)
        l0 = float(loss)
        c = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, x, y)
        l1 = float(loss)
        dt = (time.perf_counter() - t0) / iters
        print(f"bf16 b{b} {dec_up} remat={remat}: {dt*1e3:.1f} ms/step "
              f"({b/dt:.2f} vol/s) loss {l0:.4f}->{l1:.4f} "
              f"compile {c:.0f}s", flush=True)
    except Exception as e:
        print(f"bf16 b{b} {dec_up} remat={remat} FAILED "
              f"{type(e).__name__}: {str(e)[:140]}", flush=True)
