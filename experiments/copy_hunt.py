"""Attribute the data-movement time in the packed 192^3 train step.

trace_summary on the round-3 traces shows ~45% of the step is copy/slice/
DUS/reshape.  This probe (a) re-traces the CURRENT headline config
(bf16 b2, dec_up from the A/B table), (b) dumps the optimized HLO of the
same executable and ranks `copy` ops by byte volume with their JAX
source metadata (op_name), so each hot copy maps to the JAX line that
produced it, and (c) cross-references the trace's top copy instances
against the HLO names.

Run on the TPU:  python experiments/copy_hunt.py [f32|bf16] [batch]
Outputs: /tmp/trace_copyhunt_<dt>_b<b>/  and  /tmp/hlo_<dt>_b<b>.txt
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
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (hlo_copy_rows,
                                                          print_copy_report,
                                                          print_trace_report)
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()
F.set_precision_override("fast")

DT = sys.argv[1] if len(sys.argv) > 1 else "bf16"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SIZE = 192
DEC_UP = {"bf16": {1: "hybrid", 2: "composed"},
          "f32": {1: "explicit", 2: "explicit"}}[DT].get(B, "composed")
dtype = jnp.bfloat16 if DT == "bf16" else jnp.float32

rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
state = create_train_state(model, torch_adamw(1e-3),
                           jnp.zeros((1, 16, 16, 16, 1)))
x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, SIZE, 1)), dtype)
y = jnp.asarray((rng.random(size=(B, SIZE, SIZE, SIZE, 1)) > 0.5),
                jnp.float32)
step = functools.partial(packed_seg_train_step, dec_up=DEC_UP)

# ---- compile + dump optimized HLO
t0 = time.perf_counter()
state2, loss = step(state, x, y)
print(f"compile+run {time.perf_counter() - t0:.0f}s loss={float(loss):.4f}",
      flush=True)

from mri_epilepsy_diagnosis_tpu.train.seg import _packed_seg_train_step
lowered = _packed_seg_train_step.lower(state, x, y, False, DEC_UP)
compiled = lowered.compile()
hlo = compiled.as_text()
hlo_path = f"/tmp/hlo_{DT}_b{B}.txt"
with open(hlo_path, "w") as f:
    f.write(hlo)
print(f"HLO -> {hlo_path} ({len(hlo.splitlines())} lines)", flush=True)

# ---- rank copies by bytes with source metadata (shared helpers)
rows = hlo_copy_rows(hlo)
print_copy_report(rows, top=25, by_src_top=20)

# ---- fresh trace of the same executable
trace_dir = f"/tmp/trace_copyhunt_{DT}_b{B}"
with jax.profiler.trace(trace_dir):
    for _ in range(6):
        state2, loss = step(state2, x, y)
    print("traced loss", float(loss), flush=True)

print_trace_report(trace_dir, iters=6, hlo_rows=rows, ops_top=30)
