"""Sliding-window whole-brain inference throughput on TPU.

The reference's actual inference mode for patch-trained models
(`pretraining_3d_unet.ipynb` cells 26/35): GridSampler patch 64^3 overlap 4,
batch 16, aggregate by averaging.  bench.py's headline runs the whole 192^3
volume through the packed UNet in one shot (far faster); this probe measures
the torchio-parity path itself — `infer.sliding_window.sliding_window_predict`
— which matters for models trained on patches.

Grid at 192^3 / patch 64 / overlap 4: 4 locations per axis = 64 patches per
volume = 4 model calls at b16.  Probes the fine-layout apply and the
packed-v2 apply on the patch batches (packed needs even spatial dims — 64^3
qualifies).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/sliding_window_probe.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)

enable_compilation_cache()

SIZE = 192
PATCH = 64
OVERLAP = 4
BATCH = 16
ITERS = 5


def main():
    if not wait_for_backend(max_wait_s=3600):
        raise SystemExit("backend never came up")
    from mri_epilepsy_diagnosis_tpu.infer.sliding_window import (
        sliding_window_predict)
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2)

    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    vol = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(SIZE, SIZE, SIZE, 1)), jnp.bfloat16)

    def fine_apply(v, patches):
        return model.apply(v, patches)

    def packed_apply(v, patches):
        return packed_unet_apply_v2(v, patches)

    for name, apply_fn in (("packed", packed_apply), ("fine", fine_apply)):
        try:
            t0 = time.perf_counter()
            out = sliding_window_predict(
                apply_fn, variables, vol, patch_size=PATCH, overlap=OVERLAP,
                batch_size=BATCH, num_classes=2)
            float(out.sum())
            print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = sliding_window_predict(
                    apply_fn, variables, vol, patch_size=PATCH,
                    overlap=OVERLAP, batch_size=BATCH, num_classes=2)
            float(out.sum())
            dt = time.perf_counter() - t0
            print(f"{name}: {ITERS / dt:.2f} vol/s "
                  f"({dt / ITERS * 1e3:.0f} ms/vol)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
