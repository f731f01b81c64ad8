"""TPU rates for BASELINE configs 1-3: detection patch CNN train, AE
pretraining, fader enc+clf+disc alternation."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import AE, Classificator, Discriminator, PatchModel
from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.train import FaderState, create_train_state
from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
from mri_epilepsy_diagnosis_tpu.train.fader import ae_step, disc_step, enc_clf_step
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam

enable_compilation_cache()
F.set_precision_override("fast")
rng = np.random.default_rng(0)
key = jax.random.key(0)

# ---- 1. detection patch classifier (2D 16x32 pairs, batch 128)
try:
    model = PatchModel()
    st = create_train_state(model, torch_adam(1e-3), jnp.zeros((1, 16, 32, 2)))
    x = jnp.asarray(rng.normal(size=(128, 16, 32, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 128), jnp.int32)
    t0 = time.perf_counter()
    st, loss, _ = _class_step(st, x, y, key, True)
    float(loss)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        st, loss, _ = _class_step(st, x, y, key, True)
    float(loss)
    dt = (time.perf_counter() - t0) / 20
    print(f"patch-clf b128: {dt*1e3:.1f} ms/step ({128/dt:.0f} patches/s) "
          f"(compile {c:.0f}s)", flush=True)
except Exception as e:
    print(f"patch-clf FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

# ---- 2. AE pretraining (128^3, reference train_AE kwargs)
try:
    ae_kwargs = dict(c_in=1, is_skip=False, deapth=3, c_base=8, inc_size=2,
                     reduce_size=False,
                     down_block_kwargs=dict(conv_k=6, conv_pad=2, conv_s=2,
                                            maxpool_k=2, maxpool_s=2,
                                            batch_norm=True, act="l_relu"),
                     up_block_kwargs=dict(up="upsample", scale=4,
                                          scale_mode="nearest", conv_k=5,
                                          conv_pad=2, conv_s=1,
                                          batch_norm=True, act="l_relu"))
    ae = AE(**ae_kwargs)
    size, b = 128, 2
    x0 = jnp.zeros((1, size, size, size, 1))
    ae_state = create_train_state(ae, torch_adam(7e-4, weight_decay=1e-4),
                                  x0, key)
    x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), jnp.float32)
    fwd = jax.jit(lambda v, a: ((ae.apply(v, a, train=True,
                                          rngs={"dropout": key, "sample": key},
                                          mutable=["batch_stats"])[0] - a) ** 2).mean())

    def step(st, a):
        def loss_fn(p):
            out, nv = ae.apply({"params": p, "batch_stats": st.batch_stats}, a,
                               train=True, rngs={"dropout": key, "sample": key},
                               mutable=["batch_stats"])
            return ((out - a) ** 2).mean(), nv.get("batch_stats")
        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(g, new_batch_stats=bs), l

    step = jax.jit(step, donate_argnums=(0,))
    t0 = time.perf_counter()
    ae_state, loss = step(ae_state, x)
    float(loss)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        ae_state, loss = step(ae_state, x)
    float(loss)
    dt = (time.perf_counter() - t0) / 10
    print(f"AE train {size}^3 b{b}: {dt*1e3:.1f} ms/step ({b/dt:.2f} vol/s) "
          f"(compile {c:.0f}s)", flush=True)
except Exception as e:
    print(f"AE train FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

# ---- 3. fader enc+clf+disc alternation (192^3, batch 4)
try:
    ae_kwargs = dict(c_in=1, is_skip=False, deapth=3, c_base=8, inc_size=2,
                     reduce_size=False,
                     down_block_kwargs=dict(conv_k=6, conv_pad=2, conv_s=2,
                                            maxpool_k=2, maxpool_s=2,
                                            batch_norm=True, act="l_relu"))
    head_kwargs = dict(c_in=32, c_out=64, conv_k=3, conv_s=1, conv_pad=0,
                       l_in=64, l_out=32, batch_norm=True, act="relu",
                       p_drop=0.5)
    n_domains = 4
    enc = make_encoder(ae_kwargs)
    clf = Classificator(n_class=2, **head_kwargs)
    disc = Discriminator(n_domains=n_domains, **head_kwargs)
    size, b = 192, 4
    x0 = jnp.zeros((1, size, size, size, 1))
    enc_state = create_train_state(enc, torch_adam(7e-4, weight_decay=1e-4),
                                   x0, key)
    latent0, _ = enc.apply(enc_state.variables, x0)
    clf_state = create_train_state(clf, torch_adam(7e-4), latent0, key)
    disc_state = create_train_state(disc, torch_adam(5e-4), latent0, key)
    fstate = FaderState(encoder=enc_state, clf=clf_state, disc=disc_state)
    x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
    d = jnp.asarray(rng.integers(0, n_domains, b), jnp.int32)
    lam = jnp.float32(1e-3)
    t0 = time.perf_counter()
    fstate, dl, _ = disc_step(fstate, x, d, key, n_domains)
    fstate, l, _, _ = enc_clf_step(fstate, x, y, d, lam, key, n_domains)
    float(l)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        fstate, dl, _ = disc_step(fstate, x, d, key, n_domains)
        fstate, l, _, _ = enc_clf_step(fstate, x, y, d, lam, key, n_domains)
    float(l)
    dt = (time.perf_counter() - t0) / 10
    print(f"fader alt {size}^3 b{b}: {dt*1e3:.1f} ms/step ({b/dt:.2f} vol/s) "
          f"(compile {c:.0f}s)", flush=True)
except Exception as e:
    print(f"fader FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
