"""Full-graph A/B: live eval-mode BatchNorm vs fold_bn_inference.

BN running stats are jit *arguments*, so XLA cannot constant-fold the
per-channel scale/shift even at inference; `fold_bn_inference` bakes them
into the conv weights/biases once on the host, deleting every
batch_norm_packed (and its tiled-param broadcasts) from the graph.  This
measures whether that moves the needle inside the full packed-v2 mask
graph (the serving/bench headline path) at the given batch.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/bn_fold_ab.py [batch]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BODY = """
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
    fold_bn_inference, packed_unet_mask_v2)

enable_compilation_cache()
b, size, iters = {batch}, 192, 10
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
if {fold}:
    variables = fold_bn_inference(variables)


@jax.jit
def infer(variables, x):
    return packed_unet_mask_v2(variables, x).sum()


x = jnp.asarray(np.random.default_rng(0)
                .normal(size=(b, size, size, size, 1)), jnp.bfloat16)
t0 = time.perf_counter()
print(int(infer(variables, x)), "compile",
      round(time.perf_counter() - t0), "s", flush=True)
t0 = time.perf_counter()
for _ in range(iters):
    out = infer(variables, x)
int(out)
dt = time.perf_counter() - t0
print(f"RATE {{b * iters / dt:.2f}} vol/s ({{dt / iters * 1e3:.1f}} ms/step)",
      flush=True)
"""


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for name, fold in (("live-bn", "False"), ("folded", "True")):
        print(f"== {name} b{batch}", flush=True)
        code = _BODY.format(repo=REPO, batch=batch, fold=fold)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  timeout=2400, capture_output=True,
                                  text=True)
            print(proc.stdout)
            if proc.returncode != 0:
                print(proc.stderr[-2000:], flush=True)
        except subprocess.TimeoutExpired:
            print("TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
