"""A/B: Mosaic k=2 packed conv vs XLA's lax conv (VERDICT r4 #5).

The one untried lever on the bf16 192^3 train step's 78.6 ms of relayout
copies: express the shifted->aligned packed conv as Pallas kernels inside
this toolchain's Mosaic envelope (<= 2 overlapping-window dots per kernel,
static slices, (8,128)-legal blocks) — `ops.pallas_kernels.
conv2_packed_pallas`, 4 calls x 2 dots with BlockSpec row offsets.

Measured standalone at the dec1 production shape (the copy hunt's hot
site): if the kernel cannot beat XLA's conv *plus* its adjacent copy share
here, the training-copies line closes as a platform bound.

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/pallas_conv2_ab.py [small]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.ops import packed as P
from mri_epilepsy_diagnosis_tpu.ops.pallas_kernels import conv2_packed_pallas

enable_compilation_cache()

# dec1 shape of the bf16 b2 composed train graph: shifted (2,97,97,97,128)
SMALL = "small" in sys.argv[1:]
N, CELLS, CI, CO = (2, 48, 8, 8) if SMALL else (2, 96, 16, 16)

rng = np.random.default_rng(0)
xs = jnp.asarray(rng.normal(size=(N, CELLS + 1, CELLS + 1, CELLS + 1,
                                  8 * CI)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(3, 3, 3, CI, CO)), jnp.float32)
wp = P.pack_weights2(w)

xla = jax.jit(lambda xs, wp: P._conv3_packed_raw(xs, wp).sum())
pls = jax.jit(lambda xs, wp: conv2_packed_pallas(xs, wp).sum())


def timed(fn, label):
    t0 = time.perf_counter()
    out = float(fn(xs, wp))
    print(f"{label}: compile {time.perf_counter() - t0:.0f}s out={out:.1f}",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        o = fn(xs, wp)
    float(o)
    dt = (time.perf_counter() - t0) / 20
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


dt_x = timed(xla, "xla conv")
dt_p = timed(pls, "pallas 4x2-tap")
print(f"ratio pallas/xla = {dt_p / dt_x:.2f}", flush=True)

# parity (bf16-level: partials round between the four calls)
a = jax.jit(lambda xs, wp: P._conv3_packed_raw(xs, wp))(xs, wp)
b = jax.jit(lambda xs, wp: conv2_packed_pallas(xs, wp))(xs, wp)
err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
print(f"max abs err {err:.4f} (scale {float(jnp.abs(a).max()):.1f})",
      flush=True)
