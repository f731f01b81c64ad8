"""TPU probe: gradient-accumulation steps at the batches whose flat graphs
crash the remote compiler (packed 192^3 seg b4, DilatedCNN 180^3 b10)."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.ops import functional as F

enable_compilation_cache()
F.set_precision_override("fast")


def timeit(fn, sync, iters=6):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def probe_seg(batch, micro, remat):
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.train.accum import (
        packed_seg_train_step_accum)
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    size = 192
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    state = create_train_state(model, torch_adamw(1e-3),
                               jnp.zeros((1, 16, 16, 16, 1)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, size, 1)), jnp.float32)
    y = jnp.asarray(rng.random((batch, size, size, size, 1)) > 0.5,
                    jnp.float32)
    holder = {"s": state}

    def fn():
        holder["s"], loss = packed_seg_train_step_accum(
            holder["s"], x, y, micro=micro, remat=remat)
        return loss

    t0 = time.perf_counter()
    dt = timeit(fn, lambda l: float(l))
    print(f"seg 192^3 b{batch} micro={micro} remat={remat}: "
          f"{dt*1e3:.1f} ms/step ({batch/dt:.2f} vol/s) "
          f"compile {time.perf_counter()-t0-6*dt:.0f}s", flush=True)


def probe_dilated(batch, micro):
    from mri_epilepsy_diagnosis_tpu.models import DilatedCNN
    from mri_epilepsy_diagnosis_tpu.train.accum import class_train_step_accum
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    size = 180
    model = DilatedCNN(input_shape=(size,) * 3)
    st = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                            jnp.zeros((1, size, size, size, 1)))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(batch, size, size, size, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, batch), jnp.int32)
    key = jax.random.key(0)
    holder = {"s": st}

    def fn():
        holder["s"], loss, _ = class_train_step_accum(
            holder["s"], x, y, key, micro=micro)
        return loss

    t0 = time.perf_counter()
    dt = timeit(fn, lambda l: float(l))
    print(f"dilated 180^3 b{batch} micro={micro}: "
          f"{dt*1e3:.1f} ms/step ({batch/dt:.2f} vol/s) "
          f"compile {time.perf_counter()-t0-6*dt:.0f}s", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in (
        ("seg_b4m1", lambda: probe_seg(4, 1, False)),
        ("seg_b4m2r", lambda: probe_seg(4, 2, True)),
        ("dil_b10m2", lambda: probe_dilated(10, 2)),
        ("dil_b10m5", lambda: probe_dilated(10, 5)),
    ):
        if which not in ("all", name):
            continue
        try:
            fn()
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name} FAILED {type(e).__name__}: {msg}", flush=True)
