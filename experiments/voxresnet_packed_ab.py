"""A/B: packed-layout vs fine-layout VoxResNet train step (VERDICT r4 #1).

Bench config (bench.py / full_sample_classification.ipynb cell 21): 192^3
volumes, batch 10, bf16 inputs, n_filters=32, stride=2, n_blocks=4.
The r4 profile shows 48% of the fine step in thin-lane (C=32) reduce
fusions (XLA dw + BN stats); the packed trunk runs them at 256 lanes.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/voxresnet_packed_ab.py [fine|packed|both]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import VoxResNet
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()

SIZE, BATCH, ITERS = 192, 10, 10


def make_state():
    model = VoxResNet(input_shape=(SIZE,) * 3, n_filters=32, stride=2,
                      n_blocks=4, dropout=0.5, n_fc_units=192)
    st = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                            jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    return model, st


def bench(step_fn, st, x, y, label):
    key = jax.random.key(0)
    t0 = time.perf_counter()
    st, loss = step_fn(st, x, y, key)
    print(f"{label}: first step (compile) {time.perf_counter() - t0:.1f}s "
          f"loss {float(loss):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, loss = step_fn(st, x, y, key)
    float(loss)
    dt = time.perf_counter() - t0
    rate = BATCH * ITERS / dt
    print(f"{label}: {1000 * dt / ITERS:.1f} ms/step = {rate:.2f} vol/s",
          flush=True)
    return rate


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    F.set_precision_override("fast")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(BATCH, SIZE, SIZE, SIZE, 1)),
                    jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 2, BATCH), jnp.int32)

    if which in ("packed", "both"):
        from mri_epilepsy_diagnosis_tpu.models.voxresnet_packed import (
            voxresnet_class_step_packed)
        model, st = make_state()

        def pstep(st, x, y, key):
            st, loss, _ = voxresnet_class_step_packed(st, x, y, key,
                                                      model=model)
            return st, loss

        bench(pstep, st, x, y, "packed")

    if which in ("fine", "both"):
        from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
        model, st = make_state()

        def fstep(st, x, y, key):
            st, loss, _ = _class_step(st, x, y, key, True)
            return st, loss

        bench(fstep, st, x, y, "fine")


if __name__ == "__main__":
    main()
