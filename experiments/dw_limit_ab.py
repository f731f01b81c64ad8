"""A/B the dw im2col-vs-XLA routing threshold across the fine-path
training workloads (round 4).

Context: `_conv3d_vjp_bwd` builds im2col patches + one matmul when the
patch tensor fits `_DW_PATCHES_BYTES_LIMIT` (3 GB), else XLA's dw rule.
The VoxResNet profile showed the big im2col cases materialize 0.5-1.9 GB
TRANSPOSED copies per conv (16 GB/step); routing them to XLA's rule
instead (MRI_TPU_DW_LIMIT) took the b10 step 531 -> 316 ms (18.8 -> 31.6
vol/s at limit 50 MB).  This script measures the SAME knob on AE 128^3
and fader 192^3 alternation (their separable convs build 0.2-1.6 GB
patches) before any default change.

    python experiments/dw_limit_ab.py [limit_bytes ...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r'''
import time
import numpy as np
import jax, jax.numpy as jnp
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
enable_compilation_cache()
from mri_epilepsy_diagnosis_tpu.models import AE, Classificator, Discriminator
from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
from mri_epilepsy_diagnosis_tpu.train import FaderState, create_train_state
from mri_epilepsy_diagnosis_tpu.train.fader import disc_step, enc_clf_step
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
import bench

rng = np.random.default_rng(2)
key = jax.random.key(0)
ITERS = 10

# --- AE 128^3 b2 bf16 (bench config)
ae = AE(**bench.FADER_AE_KWARGS, up_block_kwargs=bench.FADER_UP_BLOCK_KWARGS)
size, b = 128, 2
st = create_train_state(ae, torch_adam(7e-4, weight_decay=1e-4),
                        jnp.zeros((1, size, size, size, 1)), key)
x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), jnp.bfloat16)

def _step(st, a):
    def loss_fn(p):
        o, nv = ae.apply({"params": p, "batch_stats": st.batch_stats}, a,
                         train=True, rngs={"dropout": key, "sample": key},
                         mutable=["batch_stats"])
        return ((o - a) ** 2).mean(), nv.get("batch_stats")
    (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
    return st.apply_gradients(g, new_batch_stats=bs), l

step = jax.jit(_step, donate_argnums=(0,))
st, loss = step(st, x); float(loss)
t0 = time.perf_counter()
for _ in range(ITERS):
    st, loss = step(st, x)
float(loss)
print(f"AE: {b * ITERS / (time.perf_counter() - t0):.2f} vol/s", flush=True)

# --- fader alternation 192^3 b4 bf16 (bench config)
head = bench.FADER_HEAD_KWARGS
nd = 4
enc = make_encoder(bench.FADER_AE_KWARGS)
clf = Classificator(n_class=2, **head)
disc = Discriminator(n_domains=nd, **head)
size, b = 192, 4
x0 = jnp.zeros((1, size, size, size, 1))
es = create_train_state(enc, torch_adam(7e-4, weight_decay=1e-4), x0, key)
latent0, _ = enc.apply(es.variables, x0)
fstate = FaderState(encoder=es,
                    clf=create_train_state(clf, torch_adam(7e-4), latent0, key),
                    disc=create_train_state(disc, torch_adam(5e-4), latent0, key))
x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), jnp.bfloat16)
y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
d = jnp.asarray(rng.integers(0, nd, b), jnp.int32)
lam = jnp.float32(1e-3)
fstate, dl, _ = disc_step(fstate, x, d, key, nd)
fstate, l, _, _ = enc_clf_step(fstate, x, y, d, lam, key, nd)
float(l)
t0 = time.perf_counter()
for _ in range(ITERS):
    fstate, dl, _ = disc_step(fstate, x, d, key, nd)
    fstate, l, _, _ = enc_clf_step(fstate, x, y, d, lam, key, nd)
float(l)
print(f"fader: {b * ITERS / (time.perf_counter() - t0):.2f} vol/s", flush=True)
'''

limits = sys.argv[1:] or ["3221225472", "50000000"]
for lim in limits:
    print(f"=== MRI_TPU_DW_LIMIT={lim} ===", flush=True)
    env = dict(os.environ, MRI_TPU_DW_LIMIT=lim)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", BODY], env=env, cwd=REPO)
    print(f"(rc={r.returncode}, {time.time() - t0:.0f}s)", flush=True)
