"""Warm the persistent compilation cache for the bench headline executables.

The machine's /tmp (and with it /tmp/mri_tpu_jax_cache) does not survive
recycling, and bench.py deliberately hard-kills cold b16 compiles (~21 min,
uninterruptible by SIGALRM) and falls back to batch 8.  This script runs the
EXACT b16 computations bench.py probes for — the packed-v2 infer step and the
seg+clf ensemble step — with no timeout, so a subsequent bench.py finds them
warm and reports the b16 headline.

The infer probe code is duplicated verbatim from bench._b16_cache_warm (the
persistent-cache key includes the jitted function's structure, so the
computation must match exactly); the ensemble step reuses bench.bench_ensemble
with iters=1, which is the same jitted `step` the real bench runs.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/warm_cache.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache

enable_compilation_cache()


def warm_infer_b16(size: int = 192) -> None:
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        fold_bn_inference, packed_unet_mask_v2)

    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    variables = fold_bn_inference(variables)  # matches bench_infer(packed)

    @jax.jit
    def infer(variables, x):
        return packed_unet_mask_v2(variables, x).sum()

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(16, size, size, size, 1)), jnp.bfloat16)
    t0 = time.perf_counter()
    print(int(infer(variables, x)), flush=True)
    print(f"# infer b16 warm in {time.perf_counter() - t0:.0f}s", flush=True)


def warm_ensemble_b16() -> None:
    import bench
    t0 = time.perf_counter()
    print(bench.bench_ensemble(192, 16, 1), flush=True)
    print(f"# ensemble b16 warm in {time.perf_counter() - t0:.0f}s",
          flush=True)


def warm_serving_e2e() -> None:
    """The r4 end-to-end serving step (int16 transfer + device znorm +
    BN-folded packed mask) — same jitted graph bench_serving_e2e runs."""
    import bench
    t0 = time.perf_counter()
    print(bench.bench_serving_e2e(192, n_vols=8, batch=8), flush=True)
    print(f"# serving e2e warm in {time.perf_counter() - t0:.0f}s",
          flush=True)


def warm_dilated_b10() -> None:
    """DilatedCNN bf16 b10 with the r4 maxpool(4,2) decomposition."""
    import subprocess
    import os
    t0 = time.perf_counter()
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run([sys.executable,
                    os.path.join(here, "dilated_s2b_ab.py"), "one",
                    "native"], check=True)
    print(f"# dilated b10 warm in {time.perf_counter() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    ok = True
    for name, fn in (("infer_b16", warm_infer_b16),
                     ("ensemble_b16", warm_ensemble_b16),
                     ("serving_e2e", warm_serving_e2e),
                     ("dilated_b10", warm_dilated_b10)):
        try:
            fn()
        except Exception as e:  # a crashed compile must not block the other
            ok = False
            print(f"# {name} warm failed: {type(e).__name__}: {e}",
                  flush=True)
    sys.exit(0 if ok else 1)
