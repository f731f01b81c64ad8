"""Compiled-Mosaic vs XLA A/B on the TPU (VERDICT r2 item 5).

Two candidates inside this toolchain's known-good Mosaic envelope
(<= 2 overlapping-window dots, static slices, no thin-lane minor concats):

1. `bn_act_zero_pads` — the fused BN+PReLU+pad-mask epilogue of every
   packed ConvBlock, swapped into the FULL packed-v2 inference graph via
   MRI_TPU_PALLAS_EPILOGUE=1 (full-graph A/B per the repo's own lesson:
   standalone op microbenches mislead).
2. `conv_one_axis(max_taps=2)` — the fader k=6 separable conv as three
   compiled two-dot kernels, vs the XLA fine conv at the same shape.

Each side runs in a subprocess: crash isolation (a Mosaic compile crash
kills only the child) + honest cold-vs-cached compile accounting.

ROUND-3 VERDICT (v5e single chip):
- epilogue: the Mosaic kernel COMPILES AND RUNS inside the full packed-v2
  b8 192^3 inference graph — 230.0 ms/step vs XLA's 228.1 (within 1%,
  XLA ahead).  First compiled Mosaic kernel executing in a production
  graph on this toolchain; stays opt-in (MRI_TPU_PALLAS_EPILOGUE=1)
  since it doesn't beat XLA's own fusion.  Mosaic compile ~4-5 min vs
  seconds for XLA.
- sep conv (max_taps=2, two-dot kernels): every production shape kills
  the remote compile helper after 10-30 min — 128->128 and 8->16 exit
  code 1, 1->8 SIGKILL (OOM).  XLA wins by default on all viable shapes.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INFER = r"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2
enable_compilation_cache()
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
@jax.jit
def infer(variables, x):
    return jnp.argmax(packed_unet_apply_v2(variables, x), axis=-1).sum()
b = 8
x = jnp.asarray(np.random.default_rng(0).normal(size=(b, 192, 192, 192, 1)),
                jnp.bfloat16)
t0 = time.perf_counter()
s0 = int(infer(variables, x))
c = time.perf_counter() - t0
t0 = time.perf_counter(); iters = 10
for _ in range(iters):
    out = infer(variables, x)
int(out)
dt = (time.perf_counter() - t0) / iters
print(f"checksum {{s0}} {{dt*1e3:.1f}} ms ({{b/dt:.1f}} vol/s) compile {{c:.0f}}s",
      flush=True)
""".format(repo=REPO)

SEP = r"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.ops.pallas_kernels import conv_one_axis
enable_compilation_cache()
mode = sys.argv[1]
# fader encoder conv1_x: k=6 stride 2 pad 2 along D, Ci=1 -> 8 @ 192^3 b4
rng = np.random.default_rng(0)
for (b, s, ci, co) in ((4, 192, 1, 8), (4, 96, 8, 16), (2, 96, 128, 128)):
    x = jnp.asarray(rng.normal(size=(b, s, s, s, ci)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(6, ci, co)), jnp.bfloat16)
    if mode == "pallas":
        f = jax.jit(lambda x, w: conv_one_axis(
            x, w, 1, stride=2, pad=2, max_taps=2).sum())
    else:
        w5 = w.reshape(6, 1, 1, ci, co)
        f = jax.jit(lambda x, w5: F.conv3d(
            x, w5, stride=(2, 1, 1), padding=(2, 0, 0)).sum())
        w = w5
    t0 = time.perf_counter()
    s0 = float(f(x, w)); c = time.perf_counter() - t0
    t0 = time.perf_counter(); iters = 10
    for _ in range(iters):
        out = f(x, w)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{{mode}} b{{b}} {{s}}^3 {{ci}}->{{co}}: {{dt*1e3:.2f}} ms "
          f"(sum {{s0:.1f}}, compile {{c:.0f}}s)", flush=True)
""".format(repo=REPO)


def run(tag, code, env_extra=None, args=()):
    env = dict(os.environ)
    env.update(env_extra or {})
    print(f"--- {tag}", flush=True)
    p = subprocess.run([sys.executable, "-c", code, *args], env=env,
                       capture_output=True, text=True, timeout=3600)
    out = (p.stdout + p.stderr).strip().splitlines()
    for ln in out[-14:]:
        print(ln, flush=True)
    if p.returncode != 0:
        print(f"{tag} FAILED rc={p.returncode}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "epilogue"):
        run("infer xla-epilogue", INFER, {"MRI_TPU_PALLAS_EPILOGUE": "0"})
        run("infer pallas-epilogue", INFER, {"MRI_TPU_PALLAS_EPILOGUE": "1"})
    if which in ("all", "sep"):
        run("sep xla", SEP, args=("xla",))
        run("sep pallas", SEP, args=("pallas",))
