"""Sliding-window A/B: patch-batch size, BN folding, aggregation impl.

The r3-shipped number (8.4 vol/s, experiments/sliding_window_probe.py) ran
batch 16 => 4 sequential `lax.map` chunks per 192^3 volume, live BN, and a
read-modify-write scan over TWO full output buffers (logits + count).

Measured (r3, packed apply, folded BN, 192^3 / patch 64 / overlap 4):
  b16 scan 9.27 | b32 scan 9.41 | b64 scan 10.54 | b64 scatter 10.50
  b64 UNROLLED 14.27 vol/s (70 ms/vol; apply-only is 60.3 ms)
Three stacked wins: fold BN (+~2%), one batch-64 model call instead of 4
serialized chunks, and static-grid aggregation — the normalization map
becomes a trace-time numpy constant (already in the scan numbers above)
and the patch adds unroll to static-index in-place updates ('unrolled',
+36% over scatter/scan, which both bottom out ~35 ms in gather/scatter
machinery).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/sliding_window_batch_ab.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)

enable_compilation_cache()

SIZE, PATCH, OVERLAP, ITERS = 192, 64, 4, 5


def main():
    if not wait_for_backend(max_wait_s=3600):
        raise SystemExit("backend never came up")
    from mri_epilepsy_diagnosis_tpu.infer.sliding_window import (
        sliding_window_predict)
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        fold_bn_inference, packed_unet_apply_v2)

    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    variables = fold_bn_inference(
        model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))))
    vol = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(SIZE, SIZE, SIZE, 1)), jnp.bfloat16)

    def packed_apply(v, patches):
        return packed_unet_apply_v2(v, patches)

    for batch, agg in ((16, "scan"), (32, "scan"), (64, "scan"),
                       (64, "scatter"), (16, "scatter"),
                       (64, "unrolled"), (16, "unrolled")):
        try:
            t0 = time.perf_counter()
            out = sliding_window_predict(
                packed_apply, variables, vol, patch_size=PATCH,
                overlap=OVERLAP, batch_size=batch, num_classes=2, agg=agg)
            float(out.sum())
            print(f"b{batch} {agg}: compile+first "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = sliding_window_predict(
                    packed_apply, variables, vol, patch_size=PATCH,
                    overlap=OVERLAP, batch_size=batch, num_classes=2, agg=agg)
            float(out.sum())
            dt = time.perf_counter() - t0
            print(f"b{batch} {agg} folded: {ITERS / dt:.2f} vol/s "
                  f"({dt / ITERS * 1e3:.0f} ms/vol)", flush=True)
        except Exception as e:
            print(f"b{batch} {agg}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
