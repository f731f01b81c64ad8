"""Full-graph A/B: bf16 (BN-folded, packed-mask — the shipped headline
configuration) vs int8 post-training-quantized packed-v2 inference at
192^3.

Motivation (experiments/int8_probe*.py, v5e): int8 convs are only
1.05-1.1x bf16 at the packed K=64/128 shapes, but bandwidth-bound ops
gain hard (maxpool 1.78x, head dot 1.46x) and int8 activations halve the
relayout-copy bytes that are 17.5% of the bf16 step.  This measures the
net effect in the full graph — the only measurement that counts
(docs/PERFORMANCE.md, packed-layout lessons).

Also reports device-side mask agreement vs the exact bf16 path, and
probes whether int8's halved activations unlock b24 (a genuine HBM OOM
in bf16).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/int8_ab.py [batches...]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BODY = """
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import (enable_compilation_cache,
                                                  wait_for_backend)
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
    fold_bn_inference, packed_unet_mask_v2)
from mri_epilepsy_diagnosis_tpu.models import unet_packed_q as Q

enable_compilation_cache()
wait_for_backend()
b, size, iters = {batch}, 192, 10
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

x = jnp.asarray(np.random.default_rng(0)
                .normal(size=(b, size, size, size, 1)), jnp.bfloat16)

if {int8}:
    calib = jnp.asarray(np.random.default_rng(1)
                        .normal(size=(1, size, size, size, 1)), jnp.bfloat16)
    t0 = time.perf_counter()
    q = Q.quantize_inference(variables, calib)
    q = jax.tree.map(jax.device_put, q)
    print("quantize+calibrate", round(time.perf_counter() - t0), "s",
          flush=True)

    @jax.jit
    def infer(q, x):
        return Q.packed_unet_mask_v2_int8(q, x).sum()

    args = (q, x)
else:
    variables = fold_bn_inference(variables)

    @jax.jit
    def infer(v, x):
        return packed_unet_mask_v2(v, x).sum()

    args = (variables, x)

t0 = time.perf_counter()
print(int(infer(*args)), "compile", round(time.perf_counter() - t0), "s",
      flush=True)
t0 = time.perf_counter()
for _ in range(iters):
    out = infer(*args)
int(out)
dt = time.perf_counter() - t0
print(f"RATE {{b * iters / dt:.2f}} vol/s ({{dt / iters * 1e3:.1f}} ms/step)",
      flush=True)

if {int8}:  # device-side agreement vs the exact bf16 path, same inputs
    vf = fold_bn_inference(model.init(jax.random.key(0),
                                      jnp.zeros((1, 16, 16, 16, 1))))
    m_ref = jax.jit(packed_unet_mask_v2)(vf, x[:1])
    m_q = jax.jit(Q.packed_unet_mask_v2_int8)(q, x[:1])
    agree = float(jnp.mean((m_ref == m_q).astype(jnp.float32)))
    print(f"mask agreement vs bf16: {{agree:.5f}}", flush=True)
"""


def main():
    batches = ([int(a) for a in sys.argv[1:]] or [8, 16])
    for batch in batches:
        for name, flag in (("bf16-fold-mask", "False"), ("int8", "True")):
            print(f"== {name} b{batch}", flush=True)
            code = _BODY.format(repo=REPO, batch=batch, int8=flag)
            try:
                proc = subprocess.run([sys.executable, "-c", code],
                                      timeout=2400, capture_output=True,
                                      text=True)
                print(proc.stdout)
                if proc.returncode != 0:
                    print(proc.stderr[-2500:], flush=True)
            except subprocess.TimeoutExpired:
                print("TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
