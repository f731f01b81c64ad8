"""Full-graph A/B: maxpool + classifier-head formulations, packed-v2 192^3.

The round-3 b16 copy hunt (experiments/infer_copy_hunt.py) attributed the
two largest relayout copies of the inference graph (3.6 GB/step each, ~9 ms
apiece at HBM rate) to the sub-axis reshapes in `maxpool2_packed` and
`conv1_packed`: XLA relays their (…,128)-lane inputs W-minor so the reshape
becomes a bitcast.  The alternates avoid the reshape entirely:

  - MRI_TPU_MAXPOOL=cascade : three lane-block max halvings + pack2
  - MRI_TPU_HEAD=blockdiag  : kron(I_8, w) dot over the full 8Ci channels

Both are bit-equal on CPU (tests/test_packed.py).  This measures all four
combinations inside the full packed-v2 b8 forward, each in its own
subprocess (the env pins are read at trace time; separate processes keep
the persistent-cache entries distinct and a compiler failure isolated).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
                   python experiments/infer_variants_ab.py [batch]
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
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2

enable_compilation_cache()
b, size, iters = {batch}, 192, 10
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

@jax.jit
def infer(variables, x):
    return jnp.argmax(packed_unet_apply_v2(variables, x), axis=-1).sum()

x = jnp.asarray(np.random.default_rng(0)
                .normal(size=(b, size, size, size, 1)), jnp.bfloat16)
t0 = time.perf_counter()
print(int(infer(variables, x)), "compile", round(time.perf_counter() - t0),
      "s", flush=True)
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
    for mp, hd in (("reshape", "reshape"), ("cascade", "reshape"),
                   ("reshape", "blockdiag"), ("cascade", "blockdiag")):
        print(f"== maxpool={mp} head={hd}", flush=True)
        env = dict(os.environ, MRI_TPU_MAXPOOL=mp, MRI_TPU_HEAD=hd)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _BODY.format(repo=REPO, batch=batch)],
                timeout=2400, capture_output=True, text=True, env=env)
            print(proc.stdout)
            if proc.returncode != 0:
                print(proc.stderr[-2000:], flush=True)
        except subprocess.TimeoutExpired:
            print("TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
