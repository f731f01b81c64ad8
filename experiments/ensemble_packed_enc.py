"""A/B: ensemble (seg + fader-encoder clf) with module vs packed encoder.

Round-2 bench: seg alone 38.8 vol/s (b16) but ensemble 28.0 — the fine-layout
separable encoder costs ~7 ms/vol.  The packed encoder (models/fader_packed)
turns the thin-lane strided separable convs into 64-128-lane cell convs.

Run on the TPU:  python experiments/ensemble_packed_enc.py [b8|b16] [enc-only]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import Classificator, UNet3D
from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
from mri_epilepsy_diagnosis_tpu.models.fader_packed import encoder_apply_packed
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2

enable_compilation_cache()
SIZE = 192
BATCH = 16 if "b16" in sys.argv else 8
ENC_ONLY = "enc-only" in sys.argv

AE_KWARGS = dict(c_in=1, is_skip=False, deapth=3, c_base=8, inc_size=2,
                 reduce_size=False,
                 down_block_kwargs=dict(conv_k=6, conv_pad=2, conv_s=2,
                                        maxpool_k=2, maxpool_s=2,
                                        batch_norm=True, act="l_relu"))
HEAD_KWARGS = dict(c_in=32, c_out=64, conv_k=3, conv_s=1, conv_pad=0,
                   l_in=64, l_out=32, batch_norm=True, act="relu", p_drop=0.5)

seg = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
             out_channels_first_layer=8)
enc = make_encoder(AE_KWARGS)
clf = Classificator(n_class=2, **HEAD_KWARGS)

seg_v = seg.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
enc_v = enc.init(jax.random.key(1), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
latent0, _ = enc.apply(enc_v, jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
clf_v = clf.init(jax.random.key(2), latent0)

x = jnp.asarray(np.random.default_rng(0)
                .normal(size=(BATCH, SIZE, SIZE, SIZE, 1)), jnp.bfloat16)


def run(name, encoder_fn):
    if ENC_ONLY:
        @jax.jit
        def step(enc_v, clf_v, x):
            latent, _ = encoder_fn(enc_v, x)
            probs = jax.nn.softmax(clf.apply(clf_v, latent), axis=-1)
            return probs.sum()

        args = (enc_v, clf_v, x)
    else:
        @jax.jit
        def step(seg_v, enc_v, clf_v, x):
            mask = jnp.argmax(packed_unet_apply_v2(seg_v, x), axis=-1)
            latent, _ = encoder_fn(enc_v, x)
            probs = jax.nn.softmax(clf.apply(clf_v, latent), axis=-1)
            return mask.sum() + probs.sum()

        args = (seg_v, enc_v, clf_v, x)
    try:
        t0 = time.perf_counter()
        float(step(*args))
        compile_s = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.1f} ms ({BATCH/dt:.1f} vol/s) "
              f"compile {compile_s:.0f}s", flush=True)
    except Exception as e:
        print(f"{name} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


run("module-enc", enc.apply)
run("packed-enc", lambda v, xx: encoder_apply_packed(v, xx, AE_KWARGS))
