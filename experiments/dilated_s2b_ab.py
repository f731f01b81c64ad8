"""A/B: DilatedCNN b10 bf16 train step with XLA's native dilated-conv
lowering vs the space-to-batch phase decomposition
(ops/functional._conv3d_s2b3, VERDICT r3 ask #5).

The DilatedCNN was the weakest baseline multiple in BENCH_r03 (31.1 vol/s,
6.0x P100) with an executed tensor-FLOP rate of only a few TFLOP/s —
suspicion: the d=3 dilated convs lower badly.  Each variant runs in its
own process (MRI_TPU_DILATED is read at import).

    python experiments/dilated_s2b_ab.py          # both variants
    python experiments/dilated_s2b_ab.py one s2b  # single
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
B, SIZE, ITERS = 10, 180, 10


def run_one(mode: str):
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
    from mri_epilepsy_diagnosis_tpu.models import DilatedCNN
    from mri_epilepsy_diagnosis_tpu.ops import functional as F
    from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    assert F._DILATED_MODE == mode, (F._DILATED_MODE, mode)
    enable_compilation_cache()
    F.set_precision_override("fast")
    model = DilatedCNN(input_shape=(SIZE,) * 3)
    state = create_train_state(model, torch_adam(1e-5, weight_decay=0.01),
                               jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    key = jax.random.wrap_key_data(jnp.asarray([0, 1], jnp.uint32))

    t0 = time.perf_counter()
    state, loss, _ = _class_step(state, x, y, key, True)
    loss0 = float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss, _ = _class_step(state, x, y, key, True)
    float(loss)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"mode": mode, "loss0": loss0,
                      "compile_s": round(compile_s, 1),
                      "step_ms": round(1e3 * dt, 1),
                      "vol_per_s": round(B / dt, 2)}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2])
        return
    for mode in ("native", "s2b"):
        env = dict(os.environ, MRI_TPU_DILATED=mode)
        print(f"=== dilated={mode} ===", flush=True)
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "one", mode], env=env, cwd=REPO)
        if r.returncode != 0:
            print(f"variant {mode} FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
