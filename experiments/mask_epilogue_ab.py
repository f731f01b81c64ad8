"""Full-graph A/B: argmax-on-fine-logits vs packed-space mask epilogue.

The b16 copy hunt put the inference epilogue at ~14 ms of iota+reduce
(argmax over the 2 fine classes) plus the 2-class unpack2 transpose;
`packed_unet_mask_v2` compares the class channel pairs in packed space and
unpacks a 1-channel mask instead.  Measures both at the given batch
(default 16) in separate subprocesses.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/mask_epilogue_ab.py [batch]
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
    packed_unet_apply_v2, packed_unet_mask_v2)

enable_compilation_cache()
b, size, iters = {batch}, 192, 10
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

if {mask}:
    @jax.jit
    def infer(variables, x):
        return packed_unet_mask_v2(variables, x).sum()
else:
    @jax.jit
    def infer(variables, x):
        return jnp.argmax(packed_unet_apply_v2(variables, x), axis=-1).sum()

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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    for name, mask in (("argmax", "False"), ("packed-mask", "True")):
        print(f"== {name} b{batch}", flush=True)
        code = _BODY.format(repo=REPO, batch=batch, mask=mask)
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
