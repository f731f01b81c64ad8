"""Layout experiments for thin-channel 3D convs on TPU.

Hypothesis from profile_192: channels-last arrays with C << 128 pad the
lane dim 16x, making every 192^3/96^3 op ~20-30x off the HBM roofline.
Candidates:
  A. baseline lax.conv NDHWC (current ops.functional path)
  B. lax.conv with W-minor dimension numbers (NDHCW)
  C. space-to-depth packed conv: pack 2^3 blocks into channels (C*8),
     convolve with the equivalent packed kernel (3^3 in packed space,
     zeros where taps don't touch), unpack.  8x the FLOPs, but full lanes.
Each measured on the two heaviest UNet shapes.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.core.mesh import enable_compilation_cache

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
        print(f"{name:38s} {dt*1e3:9.2f} ms (compile {compile_s:.0f}s)",
              flush=True)
        return out, dt
    except Exception as e:
        print(f"{name:38s} FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return None, float("nan")


DIMS_NDHWC = lax.conv_dimension_numbers((1,) * 5, (1,) * 5,
                                        ("NDHWC", "DHWIO", "NDHWC"))
DIMS_NDHCW = lax.conv_dimension_numbers((1,) * 5, (1,) * 5,
                                        ("NDHCW", "DHWIO", "NDHCW"))


def conv_ndhwc(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=DIMS_NDHWC)


def conv_ndhcw(x5, w):
    return lax.conv_general_dilated(x5, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=DIMS_NDHCW)


# ---- space-to-depth packing ------------------------------------------------

def pack2(x):
    """(N, D, H, W, C) -> (N, D/2, H/2, W/2, 8C); sub-position-major order:
    out channel index = ((sd*2+sh)*2+sw)*C + c."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def unpack2(y):
    n, d2, h2, w2, c8 = y.shape
    c = c8 // 8
    y = y.reshape(n, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, d2 * 2, h2 * 2, w2 * 2, c)


def pack_kernel(w):
    """(3,3,3,Ci,Co) fine kernel -> (3,3,3,8Ci,8Co) packed kernel.

    Output (cell X, sub s) at fine index 2X+s; tap t in [-1,1] hits fine
    index 2X+s+t = 2(X+q)+r  with  q = (s+t+1)//2 - ...; concretely
    s+t in [-1, 2] -> packed offset q in {-1, 0, 1} and sub r = (s+t) % 2.
    """
    k = np.zeros((3, 3, 3, 8, w.shape[3], 8, w.shape[4]), np.float32)
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                so = (sd * 2 + sh) * 2 + sw
                for td in range(-1, 2):
                    for th in range(-1, 2):
                        for tw in range(-1, 2):
                            qd, rd = divmod(sd + td, 2)
                            qh, rh = divmod(sh + th, 2)
                            qw, rw = divmod(sw + tw, 2)
                            si = (rd * 2 + rh) * 2 + rw
                            k[qd + 1, qh + 1, qw + 1, si, :, so, :] += \
                                np.asarray(w[td + 1, th + 1, tw + 1],
                                           np.float32)
    return k.reshape(3, 3, 3, 8 * w.shape[3], 8 * w.shape[4])


def conv_packed(xp, wp):
    return lax.conv_general_dilated(xp, wp, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=DIMS_NDHWC)


def main():
    rng = np.random.default_rng(0)
    shapes = [("enc0.conv2 8->16 @192", 4, 192, 8, 16),
              ("dec1.conv1 48->16 @192", 4, 192, 48, 16),
              ("enc1.conv2 16->32 @96", 4, 96, 16, 32)]
    for name, b, s, ci, co in shapes:
        print(f"== {name} ==", flush=True)
        x = rng.normal(size=(b, s, s, s, ci)).astype(np.float32)
        w = (rng.normal(size=(3, 3, 3, ci, co)) * 0.1).astype(np.float32)
        xd = jnp.asarray(x, DT)
        wd = jnp.asarray(w, DT)

        ref, _ = timeit("A lax NDHWC", jax.jit(conv_ndhwc), xd, wd)
        refn = None if ref is None else np.asarray(ref, np.float32)
        del ref

        # B: W-minor layout
        x5 = jnp.asarray(np.moveaxis(x, -1, 3), DT)  # (N,D,H,C,W)
        outb, _ = timeit("B lax NDHCW (W minor)", jax.jit(conv_ndhcw), x5, wd)
        if outb is not None and refn is not None:
            err = np.abs(np.moveaxis(np.asarray(outb, np.float32), 3, -1)
                         - refn).max()
            print(f"   max err vs A: {err:.4f}")
        del outb, x5

        # C: packed (space-to-depth)
        xp = jnp.asarray(pack2(x), DT)
        wp = jnp.asarray(pack_kernel(w), DT)

        outc, _ = timeit("C packed conv (8C, 3^3)", jax.jit(conv_packed),
                         xp, wp)
        if outc is not None and refn is not None:
            err = np.abs(np.asarray(unpack2(np.asarray(outc, np.float32)))
                         - refn).max()
            print(f"   max err vs A: {err:.4f}")
        del outc

        # C2: packed conv including on-device pack/unpack of the activation
        @jax.jit
        def packed_e2e(x, wp):
            return unpack2(conv_packed(pack2(x), wp))

        outc2, _ = timeit("C2 pack+conv+unpack e2e", packed_e2e, xd, wp)
        if outc2 is not None and refn is not None:
            err = np.abs(np.asarray(outc2, np.float32) - refn).max()
            print(f"   max err vs A: {err:.4f}")
        del outc2, xp, xd


if __name__ == "__main__":
    main()
