"""A/B the packed VoxResNet stem (r5 profile follow-up).

The fused k=5/s=4 Ci=1 stem conv (`conv_input_packed_s2`) lowers to the
"AllInputFeaturePackedInSublanes" emitter: 19.5 ms fwd + 12.4 ms dw of the
293 ms b10 step (experiments/voxresnet_packed_profile.py).  Variants:

  a) current: one (5,5,5,1,256) k5/s4/p(3,2) conv, fine -> shifted.
  b) fine k3/s2/p1 conv (1->32) + identity shifted-pack conv
     (2,2,2,32,256)/s2/p(1,1) — pays one thin-lane 96^3 C32 intermediate.
  c) identity pack4 conv (4,4,4,1,64)/s4 (pure data movement, constant
     kernel, no dw) + dense (2,2,2,64,256)/s1/p(1,1) conv on the pack4
     cells — every contraction is fat (K>=512), and the only backward
     term is the k2 conv's dw.

All produce the identical SHIFTED packed stem output (parity asserted);
bwd = dw only (the stem input carries no gradient).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/voxresnet_stem_ab.py
"""
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.ops import packed as P

enable_compilation_cache()
F.set_precision_override("fast")

S, B, CO = 192, 10, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, S, S, S, 1)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, CO)).astype(np.float32) * 0.1)
bias = jnp.asarray(rng.normal(size=(CO,)).astype(np.float32) * 0.1)


def stem_a(x, w):
    return P.conv_input_packed_s2(x, P.pack_input_weights_s2(w), bias)


@functools.lru_cache(maxsize=None)
def _id_shiftpack_kernel(c):
    k = np.zeros((2, 2, 2, c, 8 * c), np.float32)
    for wd in range(2):
        for wh in range(2):
            for ww in range(2):
                sub = (wd * 2 + wh) * 2 + ww
                for i in range(c):
                    k[wd, wh, ww, i, sub * c + i] = 1.0
    return k


def stem_b(x, w):
    fine = F.conv3d(x, w.astype(x.dtype), bias, stride=2, padding=1)
    k = jnp.asarray(_id_shiftpack_kernel(CO), fine.dtype)
    return lax.conv_general_dilated(
        fine, k, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=F.CONV3D_DIMS,
        precision=F._precision_for(fine.dtype)).astype(fine.dtype)


@functools.lru_cache(maxsize=None)
def _pack4_kernel():
    k = np.zeros((4, 4, 4, 1, 64), np.float32)
    for a in range(4):
        for b in range(4):
            for c in range(4):
                k[a, b, c, 0, (a * 4 + b) * 4 + c] = 1.0
    return k


@functools.lru_cache(maxsize=None)
def _axis_table_pack4():
    # A[t, r, wpos, s4]: tap t of shifted output sub r reads pack4 window
    # cell wpos sub4 s4 (j = 2r + t; j<=2 -> (0, j+1), else (1, j-3))
    a = np.zeros((3, 2, 2, 4), np.float32)
    for t in range(3):
        for r in range(2):
            j = 2 * r + t
            if j <= 2:
                a[t, r, 0, j + 1] = 1.0
            else:
                a[t, r, 1, j - 3] = 1.0
    return a


def pack4_stem_weights(w):
    # a: (t, r, wpos, s4); w[...,0,:]: (td, th, tw, co) ->
    # (wpos_d, wpos_h, wpos_w, [s4_d,s4_h,s4_w], [r_d,r_h,r_w, co])
    a = jnp.asarray(_axis_table_pack4(), w.dtype)
    wp = jnp.einsum("arek,bsfl,ctgm,abco->efgklmrsto",
                    a, a, a, w[:, :, :, 0, :])
    return wp.reshape(2, 2, 2, 64, 8 * w.shape[-1])


def stem_c(x, w):
    k4 = jnp.asarray(_pack4_kernel(), x.dtype)
    xp4 = lax.conv_general_dilated(
        x, k4, (4, 4, 4), "VALID", dimension_numbers=F.CONV3D_DIMS,
        precision=F._precision_for(x.dtype)).astype(x.dtype)
    wk = pack4_stem_weights(w)
    y = lax.conv_general_dilated(
        xp4, wk.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=F._preferred_for(x, jnp.float32),
        precision=F._precision_for(x.dtype)).astype(x.dtype)
    return y + jnp.tile(bias, 8).astype(y.dtype)


def run(fn, label):
    fwd = jax.jit(lambda x, w: P.zero_shifted_pads(fn(x, w)).sum())
    t0 = time.perf_counter()
    v = float(fwd(x, w))
    print(f"{label} fwd: compile {time.perf_counter() - t0:.0f}s "
          f"out={v:.1f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        o = fwd(x, w)
    float(o)
    print(f"{label} fwd: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms",
          flush=True)

    gw = jax.jit(jax.grad(lambda w: (P.zero_shifted_pads(fn(x, w))
                                     .astype(jnp.float32) ** 2).sum()))
    t0 = time.perf_counter()
    g = gw(w)
    float(jnp.abs(g).sum())
    print(f"{label} fwd+dw: compile {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        g = gw(w)
    float(jnp.abs(g).sum())
    print(f"{label} fwd+dw: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms",
          flush=True)


# parity first (cheap shapes on the same device)
xs = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
ga = np.asarray(jax.jit(stem_a)(xs, w).astype(jnp.float32))
for f, n in ((stem_b, "b"), (stem_c, "c")):
    gb = np.asarray(jax.jit(f)(xs, w).astype(jnp.float32))
    err = np.abs(P.zero_shifted_pads(jnp.asarray(ga))
                 - P.zero_shifted_pads(jnp.asarray(gb))).max()
    print(f"parity a vs {n}: {float(err):.2e}", flush=True)

variants = {"a": (stem_a, "a) fused k5s4"),
            "b": (stem_b, "b) fine conv + id shiftpack"),
            "c": (stem_c, "c) pack4 + k2 dense")}
which = sys.argv[1] if len(sys.argv) > 1 else "abc"
for key in which:
    run(*variants[key])
