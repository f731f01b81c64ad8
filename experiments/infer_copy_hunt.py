"""Attribute data-movement time in the packed-v2 192^3 INFERENCE graph.

Same methodology as experiments/copy_hunt.py but for the bench headline
path (packed_unet_apply_v2 forward + argmax, bf16): dump the optimized
HLO, rank `copy` ops by bytes with JAX op_name metadata, then trace the
executable and roll up device time by op kind.  The question: at b8/b16
where does the non-MXU time go, and is any of it addressable (relayout
copies, pad/slice fusions) vs intrinsic (conv fusions at HBM roofline)?

Run on the TPU:  python experiments/infer_copy_hunt.py [batch]
"""
import os
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (load_events,
                                                          summarize, top_ops)

enable_compilation_cache()
wait_for_backend()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = 192
rng = np.random.default_rng(0)

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))


@jax.jit
def fwd(v, x):
    return jnp.argmax(packed_unet_apply_v2(v, x), axis=-1).sum()


x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)

t0 = time.perf_counter()
out = int(fwd(variables, x))
print(f"compile+run {time.perf_counter() - t0:.0f}s sum={out}", flush=True)

lowered = fwd.lower(variables, x)
compiled = lowered.compile()
hlo = compiled.as_text()
hlo_path = f"/tmp/hlo_infer_b{B}.txt"
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
tot = sum(r[0] for r in rows)
print(f"\n== {len(rows)} copy ops; total {tot / 1e9:.2f} GB/step ==")
for b, name, shp, meta in rows[:20]:
    print(f"{b/1e6:9.1f} MB  {name:22s} {shp:44.44s} {meta[:90]}")

by_src = {}
for b, name, shp, meta in rows:
    k = meta.split("/")[-1][:70] if meta != "?" else "?"
    t, c = by_src.get(k, (0, 0))
    by_src[k] = (t + b, c + 1)
print("\n== copy bytes by source op_name (tail component) ==")
for k, (b, c) in sorted(by_src.items(), key=lambda kv: -kv[1][0])[:15]:
    print(f"{b/1e6:9.1f} MB {c:4d}x  {k}")

trace_dir = f"/tmp/trace_infer_b{B}"
with jax.profiler.trace(trace_dir):
    for _ in range(6):
        out = fwd(variables, x)
    print("traced sum", int(out), flush=True)

events = load_events(trace_dir)
rollup, total = summarize(events)
print(f"\n== trace rollup ({total / 6e3:.1f} ms/step, "
      f"{B * 6e3 / total:.2f} vol/s) ==")
for kind, (t, c) in sorted(rollup.items(), key=lambda kv: -kv[1][0])[:16]:
    print(f"{kind:40s} {t/6e3:8.2f} ms/step {100*t/total:5.1f}% {c:6d}")

print("\n== top individual device ops ==")
hlo_names = {name: (shp, meta) for _, name, shp, meta in rows}
for name, t, c in top_ops(events, top=25):
    extra = ""
    if name in hlo_names:
        shp, meta = hlo_names[name]
        extra = f"  <- {shp[:30]} {meta[-60:]}"
    print(f"{name:36.36s} {t/6e3:8.2f} ms/step{extra}")
