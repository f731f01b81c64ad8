"""Per-stage timing of the packed-v2 forward at the flagship shape (b8) +
b16 attempt.  Finds the remaining hotspots after the v2 redesign."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply_v2
from mri_epilepsy_diagnosis_tpu.ops import packed as P

enable_compilation_cache()
DT = jnp.bfloat16
rng = np.random.default_rng(0)
B = 8


def timeit(name, fn, *args, iters=8):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.ravel(out)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt*1e3:9.2f} ms (compile {compile_s:.0f}s)",
              flush=True)
        return dt
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return float("nan")


def pk(s, c):  # packed activation at s^3 cells, c fine channels
    return jnp.asarray(rng.normal(size=(B, s, s, s, 8 * c)), DT)


def w(ci, co):
    return jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.1, DT)


total = 0.0
def T(name, fn, *args):
    global total
    dt = timeit(name, fn, *args)
    if dt == dt:
        total += dt

xf = jnp.asarray(rng.normal(size=(B, 192, 192, 192, 1)), DT)
T("pack2 input (192,c1)", jax.jit(P.pack2), xf)

T("enc0.conv1 a->s 1->8", jax.jit(
    lambda x, wk: P.conv3_packed_as(x, P.pack_weights2_as(wk))),
  pk(96, 1), w(1, 8))
T("enc0.conv2 s->a 8->16", jax.jit(
    lambda x, wk: P.conv3_packed(x, P.pack_weights2(wk))),
  jnp.asarray(rng.normal(size=(B, 97, 97, 97, 64)), DT), w(8, 16))
T("pool1 (96c)", jax.jit(P.maxpool2_packed), pk(96, 16))
T("enc1.conv1 a->s 16->16", jax.jit(
    lambda x, wk: P.conv3_packed_as(x, P.pack_weights2_as(wk))),
  pk(48, 16), w(16, 16))
T("enc1.conv2 s->a 16->32", jax.jit(
    lambda x, wk: P.conv3_packed(x, P.pack_weights2(wk))),
  jnp.asarray(rng.normal(size=(B, 49, 49, 49, 128)), DT), w(16, 32))
T("pool2 (48c)", jax.jit(P.maxpool2_packed), pk(48, 32))
T("bot.conv1 a->s 32->32", jax.jit(
    lambda x, wk: P.conv3_packed_as(x, P.pack_weights2_as(wk))),
  pk(24, 32), w(32, 32))
T("bot.conv2 s->a 32->64", jax.jit(
    lambda x, wk: P.conv3_packed(x, P.pack_weights2(wk))),
  jnp.asarray(rng.normal(size=(B, 25, 25, 25, 256)), DT), w(32, 64))
T("dec0 upconv 64->32 (24->49)", jax.jit(
    lambda x, wk: P.upconv_packed(x, P.pack_upconv_weights(wk))),
  pk(24, 64), w(64, 32))
T("dec0 conv1_s a->s 32->32", jax.jit(
    lambda x, wk: P.conv3_packed_as(x, P.pack_weights2_as(wk))),
  pk(48, 32), w(32, 32))
T("dec0 faces", jax.jit(
    lambda y, x, wk: P.upconv_fix_faces(y, x, wk)),
  jnp.asarray(rng.normal(size=(B, 49, 49, 49, 256)), DT), pk(24, 64),
  w(64, 32))
T("dec0.conv2 s->a 32->32", jax.jit(
    lambda x, wk: P.conv3_packed(x, P.pack_weights2(wk))),
  jnp.asarray(rng.normal(size=(B, 49, 49, 49, 256)), DT), w(32, 32))
T("dec1 upconv 32->16 (48->97)", jax.jit(
    lambda x, wk: P.upconv_packed(x, P.pack_upconv_weights(wk))),
  pk(48, 32), w(32, 16))
T("dec1 conv1_s a->s 16->16", jax.jit(
    lambda x, wk: P.conv3_packed_as(x, P.pack_weights2_as(wk))),
  pk(96, 16), w(16, 16))
T("dec1 faces", jax.jit(
    lambda y, x, wk: P.upconv_fix_faces(y, x, wk)),
  jnp.asarray(rng.normal(size=(B, 97, 97, 97, 128)), DT), pk(48, 32),
  w(32, 16))
T("dec1.conv2 s->a 16->16", jax.jit(
    lambda x, wk: P.conv3_packed(x, P.pack_weights2(wk))),
  jnp.asarray(rng.normal(size=(B, 97, 97, 97, 128)), DT), w(16, 16))
T("classifier+unpack+argmax", jax.jit(
    lambda x, wk: jnp.argmax(P.unpack2(P.conv1_packed(x, wk)), -1).sum()),
  pk(96, 16), jnp.asarray(rng.normal(size=(1, 1, 1, 16, 2)) * 0.1, DT))

print(f"{'SUM':40s} {total*1e3:9.2f} ms ({B/total:.2f} vol/s)", flush=True)

# b16 full forward
model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
fwd = jax.jit(lambda v, x: jnp.argmax(
    packed_unet_apply_v2(v, x), axis=-1).sum())
x16 = jnp.asarray(rng.normal(size=(16, 192, 192, 192, 1)), DT)
dt = timeit("packed-v2 full fwd b16", fwd, variables, x16, iters=4)
if dt == dt:
    print(f"   -> {16/dt:.2f} vol/s", flush=True)
