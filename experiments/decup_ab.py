"""A/B: decoder up-branch formulation in the packed 192^3 train step
(dec_up "explicit" vs "composed" vs "hybrid") across dtype/batch.  Round-3
verdicts: f32 b1 explicit 3.58 > composed 3.38 > hybrid 3.35 vol/s; bf16 b1
hybrid 5.20 > explicit 5.08 > composed 5.05; bf16 b2 composed 5.28 >
hybrid 5.11 > explicit 5.00 -- bench pins the per-config winners."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
enable_compilation_cache()
F.set_precision_override("fast")
rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3, out_channels_first_layer=8)
for dt, b in ((jnp.float32, 1), (jnp.bfloat16, 1), (jnp.bfloat16, 2)):
    for mode in ("explicit", "composed", "hybrid"):
        state = create_train_state(model, torch_adamw(1e-3), jnp.zeros((1, 16, 16, 16, 1)))
        x = jnp.asarray(rng.normal(size=(b, 192, 192, 192, 1)), dt)
        y = jnp.asarray(rng.random((b, 192, 192, 192, 1)) > 0.5, jnp.float32)
        try:
            t0=time.perf_counter()
            state, loss = packed_seg_train_step(state, x, y, dec_up=mode)
            l0=float(loss); c=time.perf_counter()-t0
            t0=time.perf_counter(); iters=8
            for _ in range(iters):
                state, loss = packed_seg_train_step(state, x, y, dec_up=mode)
            l1=float(loss)
            s=(time.perf_counter()-t0)/iters
            print(f"{np.dtype(dt).name} b{b} {mode}: {s*1e3:.1f} ms/step ({b/s:.2f} vol/s) loss {l0:.4f}->{l1:.4f} compile {c:.0f}s", flush=True)
        except Exception as e:
            print(f"{np.dtype(dt).name} b{b} {mode} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
