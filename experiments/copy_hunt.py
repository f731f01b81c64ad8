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
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (load_events,
                                                          summarize, top_ops)
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

_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
          "u8": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}


def shape_bytes(s):
    m = _SHAPE.search(s)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _BYTES.get(m.group(1), 4)


# ---- rank copies by bytes, with metadata
rows = []
for line in hlo.splitlines():
    ls = line.strip()
    m = re.match(r"%?([\w.-]+) = ([^=]+?) copy\(", ls)
    if not m:
        continue
    name, shp = m.group(1), m.group(2)
    meta = re.search(r'op_name="([^"]*)"', ls)
    rows.append((shape_bytes(shp), name, shp.strip(),
                 meta.group(1) if meta else "?"))
rows.sort(reverse=True)
print(f"\n== {len(rows)} copy ops in optimized HLO; top by bytes ==")
tot = sum(r[0] for r in rows)
print(f"total copy bytes/step: {tot / 1e9:.2f} GB")
for b, name, shp, meta in rows[:25]:
    print(f"{b/1e6:9.1f} MB  {name:22s} {shp:44.44s} {meta[:90]}")

# group by op_name for a source-level rollup
by_src = {}
for b, name, shp, meta in rows:
    k = meta.split("/")[-1][:70] if meta != "?" else "?"
    t, c = by_src.get(k, (0, 0))
    by_src[k] = (t + b, c + 1)
print("\n== copy bytes by source op_name (tail component) ==")
for k, (b, c) in sorted(by_src.items(), key=lambda kv: -kv[1][0])[:20]:
    print(f"{b/1e6:9.1f} MB {c:4d}x  {k}")

# ---- fresh trace of the same executable
trace_dir = f"/tmp/trace_copyhunt_{DT}_b{B}"
with jax.profiler.trace(trace_dir):
    for _ in range(6):
        state2, loss = step(state2, x, y)
    print("traced loss", float(loss), flush=True)

events = load_events(trace_dir)
rollup, total = summarize(events)
print(f"\n== trace rollup ({total / 6e3:.1f} ms/step) ==")
for kind, (t, c) in sorted(rollup.items(), key=lambda kv: -kv[1][0])[:16]:
    print(f"{kind:40s} {t/6e3:8.2f} ms/step {100*t/total:5.1f}% {c:6d}")

print("\n== top individual device ops ==")
hlo_names = {name: (shp, meta) for _, name, shp, meta in rows}
for name, t, c in top_ops(events, top=30):
    extra = ""
    if name in hlo_names:
        shp, meta = hlo_names[name]
        extra = f"  <- {shp[:30]} {meta[-60:]}"
    print(f"{name:36.36s} {t/6e3:8.2f} ms/step{extra}")
