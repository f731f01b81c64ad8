"""Probe the b16..b24 gap on the SHIPPED inference path (BN-folded
packed-v2 + packed-space mask epilogue).

Known points (r3): b16 = 44.3-44.6 vol/s, b24 = genuine HBM OOM (3x ~5 GB
unpadded first-scale activations, experiments/midpoint_probe.py).  b20
puts first-scale residency at ~12.5 GB of 16 — maybe fits; b18 fallback.
Each batch runs in its own subprocess so an OOM/compiler crash doesn't
take down the next config.

Run on the TPU:  python experiments/infer_b20_probe.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_INFER = """
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
    fold_bn_inference, packed_unet_mask_v2)

enable_compilation_cache()
B = {b}
rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = fold_bn_inference(
    model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))))

@jax.jit
def fwd(v, x):
    return packed_unet_mask_v2(v, x).sum()

x = jnp.asarray(rng.normal(size=(B, 192, 192, 192, 1)), jnp.bfloat16)
t0 = time.perf_counter()
out = int(fwd(variables, x))
c = time.perf_counter() - t0
iters = 8
t0 = time.perf_counter()
for _ in range(iters):
    out = fwd(variables, x)
_ = int(out)
dt = (time.perf_counter() - t0) / iters
print(f"folded-mask infer b{{B}} @192 bf16: {{dt*1e3:.1f}} ms "
      f"-> {{B/dt:.2f}} vol/s (compile {{c:.0f}}s)", flush=True)
"""


def main():
    sys.path.insert(0, REPO)
    from mri_epilepsy_diagnosis_tpu.core.mesh import wait_for_backend

    for name, b, tmo in (("infer-b20", 20, 2700), ("infer-b18", 18, 2700)):
        print(f"== {name}", flush=True)
        wait_for_backend()
        code = _INFER.format(repo=REPO, b=b)
        try:
            subprocess.run([sys.executable, "-c", code], timeout=tmo)
        except subprocess.TimeoutExpired:
            print(f"{name} TIMEOUT after {tmo}s", flush=True)


if __name__ == "__main__":
    main()
