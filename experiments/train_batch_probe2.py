"""Re-probe packed-train batch sizes after the packed_dice_loss rewrite.

Round-3 midpoint probe showed bf16 b3 composed FLAT dies of HBM OOM
(16.92 G needed / 15.75 G capacity) with the single largest allocation the
pack2(targets) transpose intermediate — 5.06 GB of 64x lane padding for
81 MB of data (models/unet_packed.py:387 pre-rewrite).  The strided-view
loss deletes that allocation entirely, so b3 (and possibly b4) should now
fit: this probes bf16 composed flat b2 (the headline control), b3, b4.
Each config runs in its own subprocess so an OOM/compiler failure doesn't
take down the rest.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/train_batch_probe2.py
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
b = {batch}
size = 192
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
state = create_train_state(model, torch_adamw(1e-3),
                           jnp.zeros((1, 16, 16, 16, 1)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), jnp.bfloat16)
y = jnp.asarray((rng.random(size=(b, size, size, size, 1)) > 0.5),
                jnp.float32)
step = functools.partial(packed_seg_train_step, dec_up="composed")
t0 = time.perf_counter()
state, loss = step(state, x, y)
print("compile+first", round(time.perf_counter() - t0, 1), "s loss",
      float(loss), flush=True)
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, loss = step(state, x, y)
float(loss)
dt = time.perf_counter() - t0
print(f"b{{b}} composed flat bf16: {{b * iters / dt:.2f}} vol/s "
      f"({{dt / iters * 1e3:.0f}} ms/step)", flush=True)
"""


def main():
    for b, tmo in ((2, 1200), (3, 1800), (4, 1800)):
        print(f"== train-b{b}", flush=True)
        code = _TRAIN.format(repo=REPO, batch=b)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  timeout=tmo, capture_output=True, text=True)
            print(proc.stdout)
            if proc.returncode != 0:
                print(proc.stderr[-3000:], flush=True)
        except subprocess.TimeoutExpired:
            print(f"b{b}: TIMEOUT {tmo}s", flush=True)


if __name__ == "__main__":
    main()
