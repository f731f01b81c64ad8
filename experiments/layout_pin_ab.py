"""A/B the layout-pin lever on the bf16 192^3 packed train step (VERDICT
r3 ask #4): does constraining every packed conv output (+ custom-VJP dx)
to one layout via `jax.experimental.layout.with_layout_constraint` remove
the 32 GB/step of XLA relayout copies the r3 copy-hunt attributed to the
shifted-conv jvp chains?

Each variant needs its own process (ops/packed.py reads
MRI_TPU_PIN_LAYOUT at import).  Run on the TPU:

    python experiments/layout_pin_ab.py              # all variants
    python experiments/layout_pin_ab.py one <pin>    # single variant
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
VARIANTS = ("", "rowmajor", "convfav")
B, SIZE, ITERS = 2, 192, 10
DEC_UP = "composed"


def run_one(pin: str):
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.ops import functional as F
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    enable_compilation_cache()
    F.set_precision_override("fast")
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    state = create_train_state(model, torch_adamw(1e-3),
                               jnp.zeros((1, 16, 16, 16, 1)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
    y = jnp.asarray((rng.random(size=(B, SIZE, SIZE, SIZE, 1)) > 0.5),
                    jnp.float32)

    t0 = time.perf_counter()
    state, loss = packed_seg_train_step(state, x, y, dec_up=DEC_UP)
    loss0 = float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = packed_seg_train_step(state, x, y, dec_up=DEC_UP)
    float(loss)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"pin": pin or "none", "loss0": loss0,
                      "compile_s": round(compile_s, 1),
                      "step_ms": round(1e3 * dt, 1),
                      "vol_per_s": round(B / dt, 2)}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2] if len(sys.argv) > 2 else "")
        return
    for pin in VARIANTS:
        env = dict(os.environ, MRI_TPU_PIN_LAYOUT=pin)
        print(f"=== pin={pin or 'none'} ===", flush=True)
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "one", pin], env=env, cwd=REPO)
        if r.returncode != 0:
            print(f"variant {pin or 'none'} FAILED rc={r.returncode}",
                  flush=True)


if __name__ == "__main__":
    main()
