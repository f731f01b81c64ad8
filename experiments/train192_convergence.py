"""Quality-at-production-scale gate ON TPU: 192^3 bf16 packed training
must CONVERGE, not just run fast.

tests/test_quality_gates.py proves the same loop reaches Dice >= 0.95 at
24^3 on CPU; bench.py proves the 192^3 bf16 step runs at 5.3 vol/s.  This
experiment closes the gap between them: train the flagship ocfl=8 UNet
(`segmentation/routine.py:338-361` config) with the PRODUCTION step —
packed layout, bf16 activations, composed dec_up, batch 2 — on synthetic
blob volumes at the full 192^3 whole-brain size until whole-volume Dice
>= 0.95, and report steps + wall time.  (Real-data Dice 0.9399 needs the
MRI bank, absent from this image — `results_validation.ipynb` cell 9.)

Run on the TPU:  python experiments/train192_convergence.py
(CPU smoke: MRI_TPU_FORCE_CPU=1 python experiments/train192_convergence.py 32)
"""
import functools
import os
import sys
import time

import numpy as np
import jax

if os.environ.get("MRI_TPU_FORCE_CPU") == "1":
    # sitecustomize pins JAX_PLATFORMS=axon at interpreter start; the env
    # var is ignored later, only the config update works (see CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)
from mri_epilepsy_diagnosis_tpu.metrics import compute_dice_coefficient
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.utils.data import SyntheticVolumes

enable_compilation_cache()
if os.environ.get("MRI_TPU_FORCE_CPU") != "1":
    wait_for_backend()  # tunnel outages can last 30+ min
F.set_precision_override("fast")
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 192
B, MAX_STEPS, TARGET = 2, 120, 0.95

seg = SyntheticVolumes(n=4, img_shape=(SIZE,) * 3, kind="blobs")
vols = seg.volumes  # (4, 1, S, S, S) float32, blob=100.0
x_all = jnp.asarray(np.moveaxis(vols, 1, -1), jnp.bfloat16)      # NDHWC
y_all = jnp.asarray((np.moveaxis(vols, 1, -1) > 50.0), jnp.float32)

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
state = create_train_state(model, torch_adamw(1e-3),
                           jnp.zeros((1, 16, 16, 16, 1)))
step = functools.partial(packed_seg_train_step, dec_up="composed")


@jax.jit
def predict(variables, x):
    return jnp.argmax(packed_unet_apply_v2(variables, x), axis=-1)


def whole_volume_dice(variables):
    ds = []
    for i in range(vols.shape[0]):
        pred = np.asarray(predict(variables, x_all[i:i + 1]))[0]
        ds.append(compute_dice_coefficient(
            (vols[i, 0] > 50.0).astype(np.uint8), pred.astype(np.uint8)))
    return float(np.mean(ds))


t0 = time.perf_counter()
state, loss = step(state, x_all[:B], y_all[:B])
print(f"train compile+step {time.perf_counter() - t0:.0f}s "
      f"loss {float(loss):.4f}", flush=True)

t_train, steps, dice = 0.0, 1, 0.0
for it in range(1, MAX_STEPS + 1):
    t0 = time.perf_counter()
    for k in range(0, vols.shape[0], B):
        state, loss = step(state, x_all[k:k + B], y_all[k:k + B])
        steps += 1
    _ = float(loss)  # force (block_until_ready is a no-op on this transport)
    t_train += time.perf_counter() - t0
    if it % 5 == 0 or it == 1:
        dice = whole_volume_dice(state.variables)
        print(f"epoch {it:3d} steps {steps:3d} loss {float(loss):.4f} "
              f"whole-volume dice {dice:.4f} "
              f"({t_train:.1f}s train so far)", flush=True)
        if dice >= TARGET:
            break

verdict = "PASS" if dice >= TARGET else "FAIL"
print(f"{verdict}: 192^3 bf16 packed b{B} training reached dice {dice:.4f} "
      f"(target {TARGET}) in {steps} steps, {t_train:.1f}s device train time "
      f"({steps * B / t_train:.2f} vol/s sustained)", flush=True)
