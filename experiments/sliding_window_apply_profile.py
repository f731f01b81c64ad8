"""Profile the sliding-window APPLY leg and settle VERDICT r4 #3.

VERDICT r4 frames the b64 64^3 packed apply as "~2x off the direct path",
deriving a ~31 ms/vol parity point from a 1.37x voxel-coverage factor.
That factor is wrong: the torchio grid for 192^3 / patch 64 / overlap 4 is
4 locations per axis (0, 60, 120, 128) = 64 patches covering
64 * 64^3 / 192^3 = **2.37x** the voxels of the volume, so per-voxel parity
with the direct 22.5 ms/vol b16 graph is ~53 ms/vol, not 31.

This experiment pins the real numbers: direct-path per-voxel rate, the
standalone b64 64^3 apply, the full sliding-window call (apply + extract +
aggregate), a trace of the apply executable naming where its per-voxel
deficit (if any) lives, and a b32/b16-chunked comparison.

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python experiments/sliding_window_apply_profile.py [trace]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
    fold_bn_inference, packed_unet_apply_v2, packed_unet_mask_v2)

enable_compilation_cache()

SIZE, PATCH, OVERLAP, ITERS = 192, 64, 4, 10

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = fold_bn_inference(
    model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))))
rng = np.random.default_rng(0)


def timed(fn, *args, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    out = float(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt * 1e3:.1f} ms/iter (compile {compile_s:.0f}s)",
          flush=True)
    return dt


# ---- 1) direct whole-volume path, per-voxel reference
xb16 = jnp.asarray(rng.normal(size=(16, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
direct = jax.jit(lambda v, x: packed_unet_mask_v2(v, x).sum())
dt_direct = timed(direct, variables, xb16, label="direct mask b16 192^3")
vox_direct = 16 * SIZE ** 3
print(f"  direct: {dt_direct / 16 * 1e3:.1f} ms/vol, "
      f"{vox_direct / dt_direct / 1e9:.2f} Gvox/s", flush=True)

# logits (not mask) variant — the sliding-window apply must emit logits
direct_lg = jax.jit(lambda v, x: packed_unet_apply_v2(v, x).sum())
dt_direct_lg = timed(direct_lg, variables, xb16,
                     label="direct logits b16 192^3")

# ---- 2) standalone b64 64^3 apply (the sliding-window model call)
patches = jnp.asarray(rng.normal(size=(64, PATCH, PATCH, PATCH, 1)),
                      jnp.bfloat16)
apply64 = jax.jit(lambda v, p: packed_unet_apply_v2(v, p).sum())
dt_apply = timed(apply64, variables, patches, label="apply b64 64^3")
vox_apply = 64 * PATCH ** 3
print(f"  apply: {vox_apply / dt_apply / 1e9:.2f} Gvox/s "
      f"(coverage {vox_apply / SIZE ** 3:.2f}x a volume -> "
      f"per-voxel parity at {dt_direct_lg / 16 * vox_apply / (16 * SIZE ** 3) * 16 * 1e3:.1f}"
      f" ms)", flush=True)

# smaller chunks for comparison (the reference's GridSampler batches 16)
for b in (32, 16):
    pb = patches[:b]
    f = jax.jit(lambda v, p: packed_unet_apply_v2(v, p).sum())
    dt = timed(f, variables, pb, label=f"apply b{b} 64^3")
    print(f"  {b * PATCH ** 3 / dt / 1e9:.2f} Gvox/s", flush=True)

# ---- 3) full sliding-window call (apply + extract + unrolled aggregate)
from mri_epilepsy_diagnosis_tpu.infer.sliding_window import (
    sliding_window_predict)
vol = jnp.asarray(rng.normal(size=(SIZE, SIZE, SIZE, 1)), jnp.bfloat16)


def run_sw():
    return sliding_window_predict(
        lambda v, p: packed_unet_apply_v2(v, p), variables, vol,
        patch_size=PATCH, overlap=OVERLAP, batch_size=64,
        num_classes=2).sum()


dt_sw = timed(run_sw, label="sliding_window 192^3 (b64, unrolled)")
print(f"  sliding-window: {1 / dt_sw:.2f} vol/s; non-apply overhead "
      f"{(dt_sw - dt_apply) * 1e3:.1f} ms/vol", flush=True)

# ---- 4) trace the apply executable
if "trace" in sys.argv[1:]:
    from mri_epilepsy_diagnosis_tpu.obs.trace_summary import print_trace_report

    td = "/tmp/trace_sw_apply"
    with jax.profiler.trace(td):
        for _ in range(6):
            out = apply64(variables, patches)
        print("traced", float(out), flush=True)
    print_trace_report(td, iters=6, ops_top=25)

    td2 = "/tmp/trace_sw_full"
    with jax.profiler.trace(td2):
        for _ in range(6):
            out = run_sw()
        print("traced", float(out), flush=True)
    print_trace_report(td2, iters=6, ops_top=25)
