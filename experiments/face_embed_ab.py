"""Face-embed lowering A/B inside the full bf16 train graph.

The copy hunt (experiments/copy_hunt.py) shows ~32 ms/step of
constant+dynamic-update-slice fusions in the bf16 b2 composed train step —
the cell-axis `jnp.pad` embeds of the 12 upconv face fixes.  The `bcast`
mode (ops/packed.py `_embed_face`) replaces that pad with a one-hot-mask
multiply over a stride-0 broadcast, which can fuse into the surrounding
add (at the cost of a multiply+reduce transpose in the backward).
Per the repo's standing lesson, the A/B runs inside the FULL train graph;
each mode runs in its own subprocess so the env var binds before tracing.

Run on the TPU:  python experiments/face_embed_ab.py [bf16|f32] [batch]
"""
import os
import subprocess
import sys

_CHILD = """
import functools, os, sys, time
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
DT, B, DEC_UP = {dt!r}, {b}, {dec_up!r}
dtype = jnp.bfloat16 if DT == "bf16" else jnp.float32
rng = np.random.default_rng(0)
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
state = create_train_state(model, torch_adamw(1e-3),
                           jnp.zeros((1, 16, 16, 16, 1)))
x = jnp.asarray(rng.normal(size=(B, 192, 192, 192, 1)), dtype)
y = jnp.asarray((rng.random(size=(B, 192, 192, 192, 1)) > 0.5), jnp.float32)
step = functools.partial(packed_seg_train_step, dec_up=DEC_UP)
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
print(f"{{os.environ.get('MRI_TPU_EMBED_FACE', 'pad')}}: "
      f"{{dt_s*1e3:.1f}} ms/step ({{B/dt_s:.2f}} vol/s) "
      f"loss {{l0:.4f}}->{{l1:.4f}} compile {{c:.0f}}s", flush=True)
"""


def main():
    dt = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dec_up = {"bf16": {1: "hybrid", 2: "composed"},
              "f32": {1: "explicit", 2: "explicit"}}[dt].get(b, "composed")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(repo=repo, dt=dt, b=b, dec_up=dec_up)
    for mode in ("pad", "bcast"):
        env = dict(os.environ, MRI_TPU_EMBED_FACE=mode)
        print(f"== {dt} b{b} {dec_up} embed={mode}", flush=True)
        subprocess.run([sys.executable, "-c", code], env=env, timeout=3000)


if __name__ == "__main__":
    main()
