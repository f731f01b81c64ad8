"""Continuously batched whole-brain inference (the serving path).

The BASELINE.json north star: stream T1w volumes through preprocessing and
the segmenter(+classifier) as a continuously fed, data-parallel pipeline.
Host NIfTI decode / preprocessing overlaps device compute through the
prefetch thread; each device step consumes a fixed-size batch (static
shapes, one compiled program); results stream back as masks.
"""
from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import DevicePrefetcher

_STEP_CACHE: dict = {}


def _packbits_device(mask):
    """Binary (B, D, H, W) uint mask -> (B, D//8, H, W) uint8: bit i of
    byte j along D is voxel 8j+i (little-endian) — np.unpackbits(axis=1,
    bitorder='little') inverts it on host.  Cuts the mask download 8x on
    the ~40-70 MB/s tunnel (the serving wall-clock is transfer-bound).

    Packs along the LEADING spatial axis on purpose: packing the minor
    (lane) axis leaves every op on a 128-lane tile that is 24 wide —
    measured 12.3 s vs 8.4 unpacked for the 16-volume pipeline; D-axis
    packing keeps full (H, W) lane tiles (8 strided slices + shift-or)."""
    m = mask.astype(jnp.uint8)
    d = m.shape[1]
    out = None
    for i in range(8):
        part = jax.lax.slice_in_dim(m, i, d, stride=8, axis=1) << i
        out = part if out is None else out | part
    return out


def _unpackbits_host(packed, d):
    bits = np.unpackbits(np.asarray(packed), axis=1, bitorder="little")
    return bits[:, :d]


def _quantize_u8(v):
    """Host-side per-volume affine uint8 quantization: returns
    (uint8 volume, float32 [offset, scale]) with v ~ q * scale + offset.
    Inputs are T1w intensities (smooth, unimodal); 8 bits keeps mask
    agreement >= 0.999 (tests/test_serving_quant.py gate)."""
    v32 = np.asarray(v, np.float32)
    if v32 is v:                      # don't mutate the caller's buffer
        v32 = v32.copy()
    mn = float(v32.min())
    scale = (float(v32.max()) - mn) / 255.0
    if scale <= 0.0:
        scale = 1.0
    # in-place passes: 14.9 vs 32.2 ms per 192^3 volume on this host's
    # single core (the producer thread is on the serving critical path)
    np.multiply(v32, 1.0 / scale, out=v32)
    v32 -= mn / scale
    np.rint(v32, out=v32)
    np.clip(v32, 0, 255, out=v32)
    return v32.astype(np.uint8), np.asarray([mn, scale], np.float32)


def _serving_step(apply_fn, classify_fn, dtype, device_preprocess=None,
                  mask_fn=None, pack_masks=False, transfer_quant=None):
    """One jitted step per (apply_fn, classify_fn, dtype, device_preprocess,
    mask_fn, pack_masks, transfer_quant): repeated segment_volumes calls
    must not re-trace (remote compiles cost minutes)."""
    key = (apply_fn, classify_fn, jnp.dtype(dtype).name, device_preprocess,
           mask_fn, pack_masks, transfer_quant)
    if key in _STEP_CACHE:
        # LRU, not FIFO: re-insert on hit so a server cycling through many
        # step combos never evicts its hottest compiled step (remote
        # recompiles cost minutes)
        _STEP_CACHE[key] = _STEP_CACHE.pop(key)
    else:
        if len(_STEP_CACHE) >= 16:  # bound stale closures' executables
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))

        @jax.jit
        def step(variables, batch):
            if transfer_quant == "uint8":
                # device-side dequant of the 8-bit transfer: per-volume
                # affine params ride alongside the batch (2 floats/vol)
                q, qp = batch
                aff = qp.reshape(qp.shape[0], 1, 1, 1, 1, 2)
                batch = (q.astype(jnp.float32) * aff[..., 1] + aff[..., 0])
            if device_preprocess is not None:
                batch = device_preprocess(batch)
            x = batch.astype(dtype)
            if mask_fn is not None:
                # e.g. models.unet_packed.packed_unet_mask_v2: in-packed-
                # space class compare, ~6% faster than argmax-on-logits at
                # b16 192^3 (experiments/mask_epilogue_ab.py).  mask_fn's
                # output range is opaque here; pack_masks' binary contract
                # is the caller's to honour (packed_unet_mask_v2 enforces
                # out_classes == 2 itself).
                mask = mask_fn(variables, x).astype(jnp.uint8)
            else:
                logits = apply_fn(variables, x)
                if pack_masks and logits.shape[-1] > 2:
                    # >= 2 class ids would OR bits of different classes
                    # together in the packed download — corrupt, not wrong-
                    # but-plausible, so fail at trace time (ADVICE r4)
                    raise ValueError(
                        f"pack_masks=True needs a binary mask, but apply_fn "
                        f"emits {logits.shape[-1]} classes; pass a binary "
                        f"mask_fn or pack_masks=False")
                mask = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            out = {"mask": _packbits_device(mask) if pack_masks else mask}
            if classify_fn is not None:
                out["probs"] = jax.nn.softmax(
                    classify_fn(variables, x), axis=-1)
            return out

        _STEP_CACHE[key] = step
    return _STEP_CACHE[key]


def _batched(iterator: Iterable, batch_size: int):
    """Batch volumes (or (volume, aux) tuples — the quantized-transfer
    form) into fixed-size stacks, zero-padding the final partial batch."""

    def stack(items, pad):
        if isinstance(items[0], tuple):
            return tuple(stack([it[i] for it in items], pad)
                         for i in range(len(items[0])))
        out = np.stack(items)
        if pad:
            out = np.concatenate(
                [out, np.zeros((pad,) + out.shape[1:], out.dtype)])
        return out

    buf = []
    for item in iterator:
        buf.append(item)
        if len(buf) == batch_size:
            yield stack(buf, 0), len(buf)
            buf = []
    if buf:
        yield stack(buf, batch_size - len(buf)), len(buf)


def segment_volumes(apply_fn: Callable, variables, volumes: Iterable,
                    batch_size: int = 4, dtype=jnp.bfloat16,
                    preprocess: Optional[Callable] = None,
                    classify_fn: Optional[Callable] = None,
                    sharding=None,
                    device_preprocess: Optional[Callable] = None,
                    transfer_dtype=None,
                    mask_fn: Optional[Callable] = None,
                    pack_masks: bool = False,
                    transfer_quant: Optional[str] = None) -> Iterator[dict]:
    """Stream (D,H,W) or (D,H,W,1) volumes -> dicts with 'mask' (uint8) and
    optionally 'probs' from a classifier head.

    apply_fn(variables, batch) -> logits (B, D, H, W, classes).  With
    `mask_fn` given (stable callable, e.g. `packed_unet_mask_v2`), the step
    calls mask_fn(variables, batch) -> int mask directly instead of
    argmax(apply_fn(...)) — the packed-space compare is ~6% faster at b16
    192^3 (experiments/mask_epilogue_ab.py).  For eval-only serving, pass
    `variables = models.unet_packed.fold_bn_inference(variables)` — exact,
    ~2% faster still, smaller graph (experiments/bn_fold_ab.py).
    `preprocess` runs per-volume on host (numpy/jnp) before batching.
    `sharding` places batches on a mesh (data-parallel serving).

    Host->device bandwidth is the serving bottleneck on tunneled platforms
    (~20-70 MB/s here — a 192^3 f32 volume costs ~0.75 s in flight), so
    `device_preprocess` moves normalization INTO the jitted step: volumes
    transfer in their raw storage dtype (`transfer_dtype`, e.g. the int16 /
    uint8 most T1w NIfTIs ship — 2-4x fewer bytes) and
    `device_preprocess(batch) -> float batch` (e.g. `transforms.
    znormalization` vmapped) runs on device before `apply_fn`.

    Pass a STABLE callable (module-level function, not a per-call lambda)
    as `device_preprocess`: it is part of the compiled-step cache key, and
    a fresh closure per call means a fresh trace + remote compile per call.
    `preprocess` (host-side, float) and `transfer_dtype` are mutually
    exclusive — host preprocessing would silently re-widen the transfer.

    `pack_masks=True` (BINARY masks only — the 2-class segmenter) packs 8
    voxels/byte along the D axis on device and unpacks on host: 8x
    smaller mask downloads on the transfer-bound tunnel.  Requires
    D %% 8 == 0; the yielded 'mask' arrays are identical to the unpacked
    path.

    `transfer_quant="uint8"` halves the upload again vs int16: each volume
    is affine-quantized to 8 bits on host (per-volume offset/scale ride
    along as 2 floats) and dequantized inside the jitted step before
    `device_preprocess`.  Inputs are the dominant transfer term (a 192^3
    volume is 14.2 MB int16 / 7.1 MB uint8 vs 0.9 MB packed mask), and a
    z-normalizing `device_preprocess` is affine-invariant, so the only
    effect is the 8-bit rounding — mask agreement >= 0.999 is gated in
    tests/test_serving_quant.py and reported by bench_serving_e2e.
    """
    if transfer_dtype is not None and preprocess is not None:
        raise ValueError(
            "transfer_dtype and (host) preprocess are mutually exclusive: "
            "host preprocessing reverts the batch to float before transfer; "
            "use device_preprocess instead")
    if transfer_quant is not None:
        if transfer_quant != "uint8":
            raise ValueError(f"unknown transfer_quant {transfer_quant!r} "
                             "(supported: 'uint8')")
        if transfer_dtype is not None or preprocess is not None:
            raise ValueError(
                "transfer_quant replaces transfer_dtype and is incompatible "
                "with host preprocess (use device_preprocess)")

    def prepare(vol):
        if transfer_quant == "uint8":
            v = np.asarray(vol)
            if v.ndim == 3:
                v = v[..., None]
            return _quantize_u8(v)
        if transfer_dtype is not None:
            v = np.asarray(vol, transfer_dtype)
        else:
            v = np.asarray(vol, np.float32)
        if preprocess is not None:
            v = np.asarray(preprocess(v))
        if v.ndim == 3:
            v = v[..., None]
        return v

    step = _serving_step(apply_fn, classify_fn, dtype, device_preprocess,
                         mask_fn, pack_masks, transfer_quant)

    counts: list = []
    mask_w: list = []

    def producer():
        # yield host arrays: prefetch_to_device does the single (sharded)
        # transfer — staging via jnp.asarray here would commit every batch
        # to device 0 first and pay the hop twice
        for arr, n in _batched((prepare(v) for v in volumes), batch_size):
            vol_arr = arr[0] if isinstance(arr, tuple) else arr
            if pack_masks and vol_arr.shape[1] % 8:
                raise ValueError(
                    f"pack_masks needs the D dim divisible by 8, got "
                    f"{vol_arr.shape[1]} (binary masks only, e.g. the "
                    f"2-class segmenter)")
            counts.append(n)
            mask_w.append(vol_arr.shape[1])
            yield arr

    def drain(out, n, w):
        masks = (_unpackbits_host(out["mask"], w)[:n] if pack_masks
                 else np.asarray(out["mask"])[:n])
        probs = (np.asarray(out["probs"])[:n]
                 if classify_fn is not None else None)
        for i in range(n):
            yield {"mask": masks[i],
                   **({"probs": probs[i]} if probs is not None else {})}

    # One-deep result pipeline: when the next batch is already staged,
    # dispatch its step (async) BEFORE forcing the previous step's host
    # readback, so the slow device->host mask transfer (~0.4-1.4 s per
    # batch on this tunnel) overlaps the next batch's compute.  When the
    # producer has NOT staged the next batch yet, the device is idle
    # either way — flush the completed results immediately instead of
    # sitting on them (overlaps readback with host staging, and keeps a
    # paused request stream live rather than withholding finished masks
    # until future traffic arrives).
    staged = DevicePrefetcher(producer(), size=2, sharding=sharding)
    pending = None
    try:
        while True:
            batch = staged.get(block=False)
            if batch is None and not staged.exhausted:
                if pending is not None:
                    yield from drain(*pending)
                    pending = None
                batch = staged.get()
            if batch is None:
                break
            n, w = counts.pop(0), mask_w.pop(0)
            out = step(variables, batch)
            if pending is not None:
                yield from drain(*pending)
            pending = (out, n, w)
    except Exception:
        # a producer-side error (bad volume, preprocess failure) must not
        # discard the already-computed batch parked in `pending`
        if pending is not None:
            out, n, w = pending
            pending = None
            yield from drain(out, n, w)
        raise
    if pending is not None:
        yield from drain(*pending)
