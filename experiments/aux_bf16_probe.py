"""A/B: bf16 vs f32 inputs for the aux training workloads (AE 128^3
pretraining, fader enc+clf+disc alternation at 192^3).

Motivation: ops/functional contracts f32 inputs at Precision.HIGHEST
(needed for .pth parity) — on TPU that is the slow multi-pass mode, while
bf16 inputs run native single-pass MXU.  DilatedCNN gained 30.9 vs 20.0
vol/s from the same switch (experiments/dilated_bf16_probe.py); this probe
measures AE (bench_aux_workloads ae section, bench.py:467) and the fader
alternation (bench.py:497) under both input dtypes.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python experiments/aux_bf16_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import (FADER_AE_KWARGS, FADER_HEAD_KWARGS,  # noqa: E402
                   FADER_UP_BLOCK_KWARGS)
from mri_epilepsy_diagnosis_tpu.models import (AE, Classificator,  # noqa
                                               Discriminator)
from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder  # noqa
from mri_epilepsy_diagnosis_tpu.train import (FaderState,  # noqa
                                              create_train_state)
from mri_epilepsy_diagnosis_tpu.train.fader import (disc_step,  # noqa
                                                    enc_clf_step)
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam  # noqa

rng = np.random.default_rng(2)
key = jax.random.key(0)
ITERS = 15


def bench_ae(dt):
    ae = AE(**FADER_AE_KWARGS, up_block_kwargs=FADER_UP_BLOCK_KWARGS)
    size, b = 128, 2
    st = create_train_state(ae, torch_adam(7e-4, weight_decay=1e-4),
                            jnp.zeros((1, size, size, size, 1)), key)
    x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), dt)

    def _step(st, a):
        def loss_fn(p):
            o, nv = ae.apply(
                {"params": p, "batch_stats": st.batch_stats}, a,
                train=True, rngs={"dropout": key, "sample": key},
                mutable=["batch_stats"])
            return ((o - a) ** 2).mean(), nv.get("batch_stats")
        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(g, new_batch_stats=bs), l

    step = jax.jit(_step, donate_argnums=(0,))
    t0 = time.perf_counter()
    st, loss = step(st, x)
    print(f"  ae {dt.__name__} first step (compile) {time.perf_counter()-t0:.0f}s "
          f"loss={float(loss):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, loss = step(st, x)
    float(loss)
    r = b * ITERS / (time.perf_counter() - t0)
    print(f"  ae {dt.__name__}: {r:.2f} vol/s", flush=True)
    return r


def bench_fader(dt):
    head = FADER_HEAD_KWARGS
    nd = 4
    enc = make_encoder(FADER_AE_KWARGS)
    clf = Classificator(n_class=2, **head)
    disc = Discriminator(n_domains=nd, **head)
    size, b = 192, 4
    x0 = jnp.zeros((1, size, size, size, 1))
    es = create_train_state(enc, torch_adam(7e-4, weight_decay=1e-4), x0, key)
    latent0, _ = enc.apply(es.variables, x0)
    fstate = FaderState(
        encoder=es,
        clf=create_train_state(clf, torch_adam(7e-4), latent0, key),
        disc=create_train_state(disc, torch_adam(5e-4), latent0, key))
    x = jnp.asarray(rng.normal(size=(b, size, size, size, 1)), dt)
    y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
    d = jnp.asarray(rng.integers(0, nd, b), jnp.int32)
    lam = jnp.float32(1e-3)
    t0 = time.perf_counter()
    fstate, dl, _ = disc_step(fstate, x, d, key, nd)
    fstate, l, _, _ = enc_clf_step(fstate, x, y, d, lam, key, nd)
    print(f"  fader {dt.__name__} first alternation (compile) "
          f"{time.perf_counter()-t0:.0f}s loss={float(l):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        fstate, dl, _ = disc_step(fstate, x, d, key, nd)
        fstate, l, _, _ = enc_clf_step(fstate, x, y, d, lam, key, nd)
    float(l)
    r = b * ITERS / (time.perf_counter() - t0)
    print(f"  fader {dt.__name__}: {r:.2f} vol/s", flush=True)
    return r


if __name__ == "__main__":
    from mri_epilepsy_diagnosis_tpu.ops import functional as F

    print(f"devices: {jax.devices()}", flush=True)
    res = {}
    # three points per workload: bf16 input; f32 input at the bench's
    # "fast" override (f32 storage, bf16-level contractions — what
    # bench_aux_workloads actually measured in r2/r3); f32 at HIGHEST
    # (the parity mode)
    for name, fn in (("ae", bench_ae), ("fader", bench_fader)):
        for dt, override in ((jnp.bfloat16, None), (jnp.float32, "fast"),
                             (jnp.float32, None)):
            F.set_precision_override(override)
            tag = f"{name}_{dt.__name__}" + (f"_{override}" if override else "")
            try:
                res[tag] = fn(dt)
            except Exception as e:
                print(f"  {tag} FAILED: {type(e).__name__}: {e}", flush=True)
                res[tag] = float("nan")
            finally:
                F.set_precision_override(None)
    print(res)
