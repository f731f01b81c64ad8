"""Midpoint batch probes: train bf16 b3 flat, packed-v2 inference b24.

Both frontiers have a known-good and a known-crashing batch with the
midpoint untried:
  - train  bf16 composed flat: b2 = 5.28 vol/s headline, b4 crashes the
    remote compiler (experiments/train_bf16_b4_remat_probe.py) -> try b3.
  - infer  packed-v2 bf16:     b16 = 38.8-41.2 vol/s, b32 crashes -> b24.
Each config runs in its own subprocess so a helper crash (HTTP 500 /
relay kill) doesn't take down the remaining configs.

Run on the TPU:  python experiments/midpoint_probe.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TRAIN = """
import functools, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

enable_compilation_cache()
F.set_precision_override("fast")
B = {b}
rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
state = create_train_state(model, torch_adamw(1e-3),
                           jnp.zeros((1, 16, 16, 16, 1)))
x = jnp.asarray(rng.normal(size=(B, 192, 192, 192, 1)), jnp.bfloat16)
y = jnp.asarray((rng.random(size=(B, 192, 192, 192, 1)) > 0.5), jnp.float32)
step = functools.partial(packed_seg_train_step, dec_up="composed")
t0 = time.perf_counter()
state, loss = step(state, x, y)
l0 = float(loss)
c = time.perf_counter() - t0
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, loss = step(state, x, y)
l1 = float(loss)
dt_s = (time.perf_counter() - t0) / iters
print(f"train bf16 b{{B}} composed flat: {{dt_s*1e3:.1f}} ms/step "
      f"({{B/dt_s:.2f}} vol/s) loss {{l0:.4f}}->{{l1:.4f}} "
      f"compile {{c:.0f}}s", flush=True)
"""

_INFER = """
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2

enable_compilation_cache()
B = {b}
rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

@jax.jit
def fwd(v, x):
    return jnp.argmax(packed_unet_apply_v2(v, x), axis=-1).sum()

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
print(f"packed-v2 infer b{{B}} @192 bf16: {{dt*1e3:.1f}} ms "
      f"-> {{B/dt:.2f}} vol/s (compile {{c:.0f}}s)", flush=True)
"""


def main():
    sys.path.insert(0, REPO)
    from mri_epilepsy_diagnosis_tpu.core.mesh import wait_for_backend

    for name, tmpl, b, tmo in (("train-b3", _TRAIN, 3, 3600),
                               ("infer-b24", _INFER, 24, 3600)):
        print(f"== {name}", flush=True)
        wait_for_backend()  # tunnel outages can last 30+ min
        code = tmpl.format(repo=REPO, b=b)
        try:
            subprocess.run([sys.executable, "-c", code], timeout=tmo)
        except subprocess.TimeoutExpired:
            print(f"{name} TIMEOUT after {tmo}s", flush=True)


if __name__ == "__main__":
    main()
