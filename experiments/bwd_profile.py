"""Per-layer backward profile of the packed 192^3 b1 f32 train path.

For each packed conv shape of the flagship UNet (ocfl=8), time:
  - fwd               conv alone
  - grad(x,w)         XLA's default conv VJP (what training runs today)
  - grad(x)           dx alone
  - grad(w)           dw alone
plus candidate dw replacements:
  - dw-im2col         dense packed dw as k=2 patches + one MXU matmul
  - dw-qgroup         8 per-q-offset matmuls (dense in (r,s))

Run on the TPU:  python experiments/bwd_profile.py
"""
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
DT = jnp.float32  # training runs f32 on this platform (bf16 compiles hang)
rng = np.random.default_rng(0)
B = 1


def timeit(name, fn, *args, iters=10):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]
                  .astype(jnp.float32))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]
                  .astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:28s} {dt*1e3:9.2f} ms (compile {compile_s:.0f}s)",
              flush=True)
        return dt
    except Exception as e:
        print(f"  {name:28s} FAILED {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return float("nan")


def dw_im2col(xs, g, mode):
    """Dense packed dw: k=2 patches of the conv input + one matmul.
    mode 'sa': VALID over shifted input; 'as': pad-1 over aligned input."""
    c8i = xs.shape[-1]
    c8o = g.shape[-1]
    pad = [(0, 0)] * 3 if mode == "sa" else [(1, 1)] * 3
    patches = lax.conv_general_dilated_patches(
        xs, (2, 2, 2), (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    pm = patches.reshape(-1, c8i * 8)
    gm = g.reshape(-1, c8o)
    dw = jnp.matmul(pm.T, gm, preferred_element_type=jnp.float32)
    return dw.reshape(c8i, 2, 2, 2, c8o).transpose(1, 2, 3, 0, 4)


def dw_qgroup(xs, g, mode):
    """8 per-q-offset slice+matmul contractions (dense in (r,s))."""
    c8i = xs.shape[-1]
    c8o = g.shape[-1]
    if mode == "as":
        xs = jnp.pad(xs, ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
    od, oh, ow = g.shape[1:4]
    gm = g.reshape(-1, c8o)
    out = []
    for qd in range(2):
        for qh in range(2):
            for qw in range(2):
                sl = xs[:, qd:qd + od, qh:qh + oh, qw:qw + ow, :]
                pm = sl.reshape(-1, c8i)
                out.append(jnp.matmul(pm.T, gm,
                                      preferred_element_type=jnp.float32))
    dw = jnp.stack(out).reshape(2, 2, 2, c8i, c8o)
    return dw


LAYERS = [
    # name, cells_in, c_in_fine, c_out_fine, mode ('as' aligned->shifted,
    # 'sa' shifted->aligned) — the four 96/97-cell layers dominate the step
    ("enc0.conv1 1->8   96a", 96, 1, 8, "as"),
    ("enc0.conv2 8->16  97s", 97, 8, 16, "sa"),
    ("dec1.conv1s 16->16 96a", 96, 16, 16, "as"),
    ("dec1.conv2 16->16 97s", 97, 16, 16, "sa"),
]

tot = {"fwd": 0.0, "gxw": 0.0, "gw": 0.0, "im2col": 0.0, "qgrp": 0.0}

for name, s, ci, co, mode in LAYERS:
    print(name, flush=True)
    x = jnp.asarray(rng.normal(size=(B, s, s, s, 8 * ci)), DT)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.1, DT)
    if mode == "as":
        conv = lambda xx, ww: P.conv3_packed_as(xx, P.pack_weights2_as(ww))
        out_s = s + 1
    else:
        conv = lambda xx, ww: P.conv3_packed(xx, P.pack_weights2(ww))
        out_s = s - 1
    g = jnp.asarray(rng.normal(size=(B, out_s, out_s, out_s, 8 * co)), DT)

    loss = lambda xx, ww: jnp.vdot(conv(xx, ww), g)
    r = {}
    r["fwd"] = timeit("fwd", jax.jit(conv), x, w)
    r["gxw"] = timeit("grad(x,w)", jax.jit(jax.grad(loss, argnums=(0, 1))),
                      x, w)
    r["gw"] = timeit("grad(w)", jax.jit(jax.grad(loss, argnums=1)), x, w)
    r["im2col"] = timeit("dw-im2col(dense)",
                         jax.jit(lambda xx, gg: dw_im2col(xx, gg, mode)),
                         x, g)
    r["qgrp"] = timeit("dw-qgroup(dense)",
                       jax.jit(lambda xx, gg: dw_qgroup(xx, gg, mode)),
                       x, g)
    for k, v in r.items():
        if v == v:
            tot[k] += v

print("\nTOTALS over profiled convs:", flush=True)
for k, v in tot.items():
    print(f"  {k:10s} {v*1e3:9.2f} ms", flush=True)
