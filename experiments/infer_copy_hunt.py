"""Attribute data-movement time in the packed-v2 192^3 INFERENCE graph.

Same methodology as experiments/copy_hunt.py but for the bench headline
path (packed_unet_apply_v2 forward + argmax, bf16): dump the optimized
HLO, rank `copy` ops by bytes with JAX op_name metadata, then trace the
executable and roll up device time by op kind.  The question: at b8/b16
where does the non-MXU time go, and is any of it addressable (relayout
copies, pad/slice fusions) vs intrinsic (conv fusions at HBM roofline)?

Run on the TPU:  python experiments/infer_copy_hunt.py [batch] [--mask]
                   [--fold]
(`--mask` profiles the packed-space mask epilogue — the round-3 headline
path, packed_unet_mask_v2 — instead of argmax-on-fine-logits; `--fold`
additionally bakes eval-BN into the conv weights, i.e. the shipped bench
configuration.)
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
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
    fold_bn_inference, packed_unet_apply_v2, packed_unet_mask_v2)
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import (hlo_copy_rows,
                                                          print_copy_report,
                                                          print_trace_report)

enable_compilation_cache()
wait_for_backend()
args = [a for a in sys.argv[1:] if not a.startswith("-")]
MASK = "--mask" in sys.argv
FOLD = "--fold" in sys.argv
B = int(args[0]) if args else 8
SIZE = 192
rng = np.random.default_rng(0)

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
if FOLD:
    variables = fold_bn_inference(variables)


if MASK:
    @jax.jit
    def fwd(v, x):
        return packed_unet_mask_v2(v, x).sum()
else:
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
hlo_path = (f"/tmp/hlo_infer{'_mask' if MASK else ''}"
            f"{'_fold' if FOLD else ''}_b{B}.txt")
with open(hlo_path, "w") as f:
    f.write(hlo)
print(f"HLO -> {hlo_path} ({len(hlo.splitlines())} lines)", flush=True)

rows = hlo_copy_rows(hlo)
print_copy_report(rows, top=20, by_src_top=15)

trace_dir = (f"/tmp/trace_infer{'_mask' if MASK else ''}"
             f"{'_fold' if FOLD else ''}_b{B}")
with jax.profiler.trace(trace_dir):
    for _ in range(6):
        out = fwd(variables, x)
    print("traced sum", int(out), flush=True)

# device-time rollup; header carries the implied device-resident vol/s
total = print_trace_report(trace_dir, iters=6, hlo_rows=rows, ops_top=25,
                           header_extra="")
print(f"(device-resident rate: {B * 6e6 / total:.2f} vol/s)")
