"""End-to-end packed UNet vs baseline at the flagship 192^3 bench shape,
plus individual packed ops, on the real TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply
from mri_epilepsy_diagnosis_tpu.ops import packed as P

enable_compilation_cache()
DT = jnp.bfloat16


def timeit(name, fn, *args, iters=10):
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


B, S = 4, 192
rng = np.random.default_rng(0)

model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
               out_channels_first_layer=8)
variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

x = jnp.asarray(rng.normal(size=(B, S, S, S, 1)), DT)

packed_fwd = jax.jit(lambda v, x: jnp.argmax(
    packed_unet_apply(v, x), axis=-1).sum())
dt = timeit("packed UNet fwd+argmax b4 @192", packed_fwd, variables, x)
if dt == dt:
    print(f"   -> {B/dt:.2f} vol/s (baseline round 1: 10.0)", flush=True)

# keep the argmax packed too: unpack only a tiny mask reduction
@jax.jit
def packed_fwd_argmax_packed(v, x):
    # replicate packed_unet_apply but argmax in packed layout before unpack
    from mri_epilepsy_diagnosis_tpu.models import unet_packed as U
    params = v["params"]; stats = v.get("batch_stats", {})
    xp = None
    shifted0 = P.pack2_shifted(x)
    skips = []
    for i in range(2):
        blk = params["encoder"][f"encoding_blocks__{i}"]
        bst = stats.get("encoder", {}).get(f"encoding_blocks__{i}", {})
        xp = U._conv_block_packed(xp, blk["conv1"], bst.get("conv1", {}),
                                  shifted_input=shifted0 if i == 0 else None)
        shifted0 = None
        xp = U._conv_block_packed(xp, blk["conv2"], bst.get("conv2", {}))
        skips.append(xp)
        xp = P.maxpool2_packed(xp)
    blk = params["bottom_block"]; bst = stats.get("bottom_block", {})
    xp = U._conv_block_packed(xp, blk["conv1"], bst.get("conv1", {}))
    xp = U._conv_block_packed(xp, blk["conv2"], bst.get("conv2", {}))
    for i in range(2):
        blk = params["decoder"][f"decoding_blocks__{i}"]
        bst = stats.get("decoder", {}).get(f"decoding_blocks__{i}", {})
        up = P.upsample2_packed(xp)
        xp = P.concat_channels_packed(skips[-(i + 1)], up)
        xp = U._conv_block_packed(xp, blk["conv1"], bst.get("conv1", {}))
        xp = U._conv_block_packed(xp, blk["conv2"], bst.get("conv2", {}))
    head = params["classifier"]["conv_layer"]
    yp = P.conv1_packed(xp, head["weight"], head.get("bias"))
    n, d, h, w, _ = yp.shape
    mask = jnp.argmax(yp.reshape(n, d, h, w, 8, 2), axis=-1)  # (n,d,h,w,8)
    return mask.sum()

dt = timeit("packed UNet fwd, packed argmax b4", packed_fwd_argmax_packed,
            variables, x)
if dt == dt:
    print(f"   -> {B/dt:.2f} vol/s", flush=True)

# individual ops at the enc0.conv2 shape
w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)) * 0.1, DT)
xf = jnp.asarray(rng.normal(size=(B, S, S, S, 8)), DT)
xp = P.pack2(xf)
wp = P.pack_weights2(w)
timeit("conv3_packed k2 64->128 @96c",
       jax.jit(lambda a, b: P.conv3_packed(P.repack_shifted(a), b)), xp, wp)
timeit("repack_shifted 64ch @96c", jax.jit(P.repack_shifted), xp)
timeit("maxpool2_packed 128ch @96c",
       jax.jit(P.maxpool2_packed),
       jnp.asarray(rng.normal(size=(B, 96, 96, 96, 128)), DT))
timeit("upsample2_packed 256ch @48c",
       jax.jit(P.upsample2_packed),
       jnp.asarray(rng.normal(size=(B, 48, 48, 48, 256)), DT))

# batch sweep of the best packed forward
for b in (8, 16):
    xb = jnp.asarray(rng.normal(size=(b, S, S, S, 1)), DT)
    dt = timeit(f"packed UNet fwd b{b}", packed_fwd_argmax_packed,
                variables, xb, iters=max(4, 32 // b))
    if dt == dt:
        print(f"   -> {b/dt:.2f} vol/s", flush=True)
