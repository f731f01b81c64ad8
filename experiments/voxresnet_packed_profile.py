"""Trace + copy report of the packed VoxResNet train step (r5).

First A/B: packed 34.1 vol/s vs fine 31.7 at 192^3 b10 bf16 — the packed
trunk removed the thin-lane BN/dw reductions but something else dominates.
Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/voxresnet_packed_profile.py
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (
    hlo_copy_rows, print_copy_report, print_trace_report)
from mri_epilepsy_diagnosis_tpu.models import VoxResNet
from mri_epilepsy_diagnosis_tpu.models.voxresnet_packed import (
    voxresnet_class_step_packed)
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()
F.set_precision_override("fast")
SIZE, B = 192, 10
model = VoxResNet(input_shape=(SIZE,) * 3, n_filters=32, stride=2,
                  n_blocks=4, dropout=0.5, n_fc_units=192)
state = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                           jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
y = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
key = jax.random.wrap_key_data(jnp.asarray([0, 1], jnp.uint32))

t0 = time.perf_counter()
state, loss, _ = voxresnet_class_step_packed(state, x, y, key, model=model)
print(f"compile+run {time.perf_counter() - t0:.0f}s loss={float(loss):.4f}",
      flush=True)
t0 = time.perf_counter()
for _ in range(10):
    state, loss, _ = voxresnet_class_step_packed(state, x, y, key, model=model)
float(loss)
dt = (time.perf_counter() - t0) / 10
print(f"step {dt * 1e3:.1f} ms -> {B / dt:.1f} vol/s", flush=True)

lowered = voxresnet_class_step_packed.lower(state, x, y, key, model=model)
hlo = lowered.compile().as_text()
open("/tmp/hlo_voxresnet_packed.txt", "w").write(hlo)
rows = hlo_copy_rows(hlo)
print_copy_report(rows, top=12, by_src_top=12)

td = "/tmp/trace_voxresnet_packed"
with jax.profiler.trace(td):
    for _ in range(6):
        state, loss, _ = voxresnet_class_step_packed(state, x, y, key,
                                                     model=model)
    print("traced", float(loss), flush=True)
print_trace_report(td, iters=6, hlo_rows=rows, ops_top=30)
