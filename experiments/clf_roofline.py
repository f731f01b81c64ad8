"""Roofline/profile of the classification training steps (VERDICT r3 #5).

DilatedCNN bf16 b10 runs 31.1 vol/s (6.0x the P100 baseline) and VoxResNet
18.8 (9x) — the weakest multiples in BENCH_r03, with no recorded profile
explaining the bound.  This traces both steps, prints the op-class
breakdown + top ops, and computes the analytic FLOP count so the gap to
the MXU roofline is a number.

Run on the TPU:  python experiments/clf_roofline.py [dilated|voxresnet]
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
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (hlo_copy_rows,
                                                          print_copy_report,
                                                          print_trace_report)
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()
F.set_precision_override("fast")

WHICH = sys.argv[1] if len(sys.argv) > 1 else "dilated"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def conv_flops(spatial_out, ci, co, k=3):
    n = 1
    for s in spatial_out:
        n *= s
    return 2 * n * ci * co * k ** 3


if WHICH == "dilated":
    from mri_epilepsy_diagnosis_tpu.models import DilatedCNN

    SIZE = 180
    model = DilatedCNN(input_shape=(SIZE,) * 3)
    # analytic per-sample FLOPs (fwd; bwd ~2x more)
    s1 = (SIZE - 7) // 2 + 1          # conv1 stride2 d3 VALID -> 87
    s2 = s1                           # conv2 pad3
    p1 = (s2 - 4) // 2 + 1            # maxpool 4/2 -> 42
    s3 = (p1 - 7) // 2 + 1            # conv3 -> 18
    s4 = s3
    p2 = (s4 - 4) // 2 + 1            # -> 8
    s5 = p2
    s6 = s5 - 6                       # conv6 VALID d3 -> 2
    fwd = (conv_flops((s1,) * 3, 1, 32) + conv_flops((s2,) * 3, 32, 32)
           + conv_flops((s3,) * 3, 32, 64) + conv_flops((s4,) * 3, 64, 64)
           + conv_flops((s5,) * 3, 64, 128) + conv_flops((s6,) * 3, 128, 128))
    print(f"sizes conv1..6: {s1} {s2} {s3} {s4} {s5} {s6}; "
          f"fwd {fwd / 1e9:.1f} GFLOP/sample, train ~{3 * fwd / 1e9:.1f}",
          flush=True)
else:
    from mri_epilepsy_diagnosis_tpu.models import VoxResNet

    SIZE = 192  # the bench config (voxresnet_train_config bf16_b10)
    model = VoxResNet(input_shape=(SIZE,) * 3, n_filters=32, stride=2,
                      n_blocks=4, dropout=0.5, n_fc_units=192)

state = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                           jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
y = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
key = jax.random.wrap_key_data(jnp.asarray([0, 1], jnp.uint32))

t0 = time.perf_counter()
state, loss, _ = _class_step(state, x, y, key, True)
print(f"compile+run {time.perf_counter() - t0:.0f}s loss={float(loss):.4f}",
      flush=True)

t0 = time.perf_counter()
for _ in range(10):
    state, loss, _ = _class_step(state, x, y, key, True)
float(loss)
dt = (time.perf_counter() - t0) / 10
print(f"step {dt * 1e3:.1f} ms -> {B / dt:.1f} vol/s", flush=True)
if WHICH == "dilated":
    print(f"executed tensor-FLOP rate ~{3 * fwd * B / dt / 1e12:.1f} TFLOP/s "
          f"(v5e bf16 peak ~197)", flush=True)

lowered = _class_step.lower(state, x, y, key, True)
hlo = lowered.compile().as_text()
path = f"/tmp/hlo_clf_{WHICH}_b{B}.txt"
open(path, "w").write(hlo)
print(f"HLO -> {path}", flush=True)
rows = hlo_copy_rows(hlo)
print_copy_report(rows, top=12, by_src_top=12)

trace_dir = f"/tmp/trace_clf_{WHICH}_b{B}"
with jax.profiler.trace(trace_dir):
    for _ in range(6):
        state, loss, _ = _class_step(state, x, y, key, True)
    print("traced loss", float(loss), flush=True)
print_trace_report(trace_dir, iters=6, hlo_rows=rows, ops_top=30)
