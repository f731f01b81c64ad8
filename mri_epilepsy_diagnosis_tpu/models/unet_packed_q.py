"""int8-quantized packed-v2 inference for the flagship UNet3D.

Post-training static quantization, beyond the reference's capabilities (it
runs f32 torch end to end — `segmentation/routine.py:338-361` is the model
this path serves): symmetric per-output-channel int8 weights + per-site
per-tensor int8 activations calibrated on representative volumes, running
the exact packed-v2 dataflow of `unet_packed._trunk_v2` with int8 convs
(`lax.conv_general_dilated(int8, int8) -> int32`) and fused
dequant -> bias -> PReLU -> requant epilogues.

Why (v5e measurements, experiments/int8_probe*.py): the int8 MXU rate is
only ~1.05-1.1x bf16 at the packed conv shapes (K=64/128 limits the
systolic passes either way), but every bandwidth-bound op halves its HBM
traffic — maxpool 1.78x, the classifier head dot 1.46x — and int8
activations halve the XLA relayout-copy bytes that are 17.5% of the bf16
step.  Accuracy is gated by tests (mask agreement vs the exact bf16 path
on the shipped reference checkpoint).

Usage:
    variables = ...                                # trained / imported
    qvars = quantize_inference(variables, calib)   # calib: (N,S,S,S,1)
    mask = packed_unet_mask_v2_int8(qvars, x)      # ~= packed_unet_mask_v2

The quantized pytree is a flat dict of jax arrays — jit-friendly,
checkpointable with the standard utilities.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import functional as F
from ..ops import packed as P
from .unet_packed import _trunk_v2, fold_bn_inference

QMAX = 127.0


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def quantize_act(x, scale):
    """float -> int8 with symmetric per-tensor scale (x ~= q * scale)."""
    return _requant(x.astype(jnp.float32), 1.0 / scale)


def _requant(y, rq):
    """float -> int8 by the (reciprocal) scale `rq` (x ~= q / rq)."""
    return jnp.clip(jnp.round(y * rq), -QMAX, QMAX).astype(jnp.int8)


def quantize_weight_per_oc(w):
    """float kernel (..., Co) -> (int8 kernel, dequant scale (Co,)):
    w ~= w8 * scale[co], symmetric per-output-channel."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / QMAX
    w8 = jnp.clip(jnp.round(w / scale), -QMAX, QMAX).astype(jnp.int8)
    return w8, scale


def conv_int8(x8, w8, padding):
    """int8 x int8 -> int32 packed conv (VALID: shifted->aligned;
    [(1,1)]*3: aligned->shifted)."""
    return lax.conv_general_dilated(
        x8, w8, (1, 1, 1), padding, dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.int32)


def upconv_int8(x8, wk8):
    """int8 composed upsample+conv (`ops.packed.upconv_packed`) -> int32.
    `edge_pad_cells` is dtype-generic (pad + plane writes), so the edge
    replication happens in int8."""
    return lax.conv_general_dilated(
        P.edge_pad_cells(x8), wk8, (1, 1, 1), [(1, 1)] * 3,
        lhs_dilation=(2, 2, 2), dimension_numbers=F.CONV3D_DIMS,
        preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------


def site_names(num_encoding_blocks: int = 3):
    names = ["in"]
    for i in range(num_encoding_blocks - 1):
        names += [f"e{i}c1", f"e{i}c2"]
    names += ["bc1", "bc2"]
    for i in range(num_encoding_blocks - 1):
        names += [f"d{i}c1", f"d{i}c2"]
    return names


@functools.lru_cache(maxsize=None)
def _observer(num_encoding_blocks: int):
    @jax.jit
    def run(v, x):
        rec = {}

        def tap(name, t):
            c8 = t.shape[-1]
            a = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1, 2, 3))
            rec[name] = a.reshape(8, c8 // 8).max(axis=0)
            return t

        _trunk_v2(v, x, num_encoding_blocks, tap=tap)
        return rec

    return run


def calibrate(variables, calib_x, num_encoding_blocks: int = 3):
    """Run the exact (float) packed-v2 forward on `calib_x` and record the
    per-fine-channel absolute maximum at every conv-input site.

    Per-channel (not per-tensor) activation ranges matter here because the
    convs carry folded BatchNorm: channel magnitudes differ by an order of
    magnitude, and a shared scale crushes the small-range channels (mask
    agreement on the shipped checkpoint: 0.980 per-tensor vs per-channel —
    experiments/int8_ab.py).  Returns {site: (C,) numpy absmax}."""
    rec = _observer(num_encoding_blocks)(variables, calib_x)
    return {k: np.asarray(v, np.float32) for k, v in rec.items()}


# ---------------------------------------------------------------------------
# quantization of a trained model
# ---------------------------------------------------------------------------


def quantize_inference(variables, calib_x, num_encoding_blocks: int = 3,
                       act_margin: float = 1.0):
    """BN-folded variables (or live-BN variables, folded here) + calibration
    volumes -> int8 inference pytree for `packed_unet_*_int8`.

    Activations are quantized with PER-FINE-CHANNEL scales: each producer
    epilogue requants by a per-channel vector, and the consumer conv folds
    the producer's scales into its weight's input-channel axis BEFORE
    per-output-channel weight quantization (exact: conv is linear per input
    channel).  That keeps the int8 conv per-tensor (the MXU requirement)
    while giving every channel its own dynamic range — necessary because
    the folded-BN convs leave channel magnitudes an order of magnitude
    apart.  `act_margin` scales the calibrated absmax (values beyond it
    saturate)."""
    if "batch_stats" in variables or _has_norm(variables["params"]):
        variables = fold_bn_inference(variables)
    params = variables["params"]
    nb = num_encoding_blocks
    scales = {k: np.maximum(v * act_margin, 1e-12) / QMAX
              for k, v in calibrate(variables, calib_x, nb).items()}

    # nb as a strongly-typed leaf (weak-typed python scalars retrace — see
    # CLAUDE.md); the traced forward derives nb from the KEYS instead
    q = {"nb": np.int32(nb),
         "in_rq": jnp.asarray(np.tile(1.0 / scales["in"], 8), jnp.float32)}

    def _fold_in(w, s_in):
        """Fold the producer's per-channel act scales into the FINE kernel's
        input axis (w: (3,3,3,Ci,Co) or (Ci,Co))."""
        return jnp.asarray(w, jnp.float32) * s_in[:, None]

    def _entry(site_out, w_fine, s_in, bias, alpha, pack):
        w8, wscale = quantize_weight_per_oc(pack(_fold_in(w_fine, s_in)))
        e = {"w8": w8, "dq": wscale.astype(jnp.float32)}
        e["b"] = (jnp.tile(jnp.asarray(bias, jnp.float32), 8)
                  if bias is not None else None)
        e["alpha"] = (jnp.asarray(alpha, jnp.float32)
                      if alpha is not None else None)
        if site_out is not None:
            e["rq"] = jnp.asarray(np.tile(1.0 / scales[site_out], 8),
                                  jnp.float32)
        return e

    def _alpha(blk):
        a = blk.get("activation_layer")
        return a["weight"] if a else None

    enc, dec = {}, {}
    prev = "in"
    for i in range(nb - 1):
        blk = params["encoder"][f"encoding_blocks__{i}"]
        c1, c2 = blk["conv1"], blk["conv2"]
        enc[f"e{i}c1"] = _entry(
            f"e{i}c1", c1["conv_layer"]["weight"], scales[prev],
            c1["conv_layer"].get("bias"), _alpha(c1), P.pack_weights2_as)
        enc[f"e{i}c2"] = _entry(
            f"e{i}c2", c2["conv_layer"]["weight"], scales[f"e{i}c1"],
            c2["conv_layer"].get("bias"), _alpha(c2), P.pack_weights2)
        prev = f"e{i}c2"  # maxpool is per-channel: it preserves the scales

    blk = params["bottom_block"]
    enc["bc1"] = _entry(
        "bc1", blk["conv1"]["conv_layer"]["weight"], scales[prev],
        blk["conv1"]["conv_layer"].get("bias"), _alpha(blk["conv1"]),
        P.pack_weights2_as)
    enc["bc2"] = _entry(
        "bc2", blk["conv2"]["conv_layer"]["weight"], scales["bc1"],
        blk["conv2"]["conv_layer"].get("bias"), _alpha(blk["conv2"]),
        P.pack_weights2)
    prev = "bc2"

    for i in range(nb - 1):
        blk = params["decoder"][f"decoding_blocks__{i}"]
        skip_site = f"e{nb - 2 - i}c2"
        c1, c2 = blk["conv1"], blk["conv2"]
        w1 = c1["conv_layer"]["weight"]
        c_skip = _skip_channels(params, nb, i)
        w_s, w_u = w1[:, :, :, :c_skip, :], w1[:, :, :, c_skip:, :]
        e_s = _entry(f"d{i}c1", w_s, scales[skip_site],
                     c1["conv_layer"].get("bias"), _alpha(c1),
                     P.pack_weights2_as)
        # up branch: fold the coarse input's scales into w_u, THEN compose;
        # the face fixes reuse the same folded fine kernel with the raw
        # int8 planes (dequant_scale=1: the fold already absorbed the scale)
        w_u_eff = _fold_in(w_u, scales[prev])
        w8_u, ws_u = quantize_weight_per_oc(P.pack_upconv_weights(w_u_eff))
        e_s["w8_u"] = w8_u
        e_s["dq_u"] = ws_u.astype(jnp.float32)
        e_s["w_u_fine"] = w_u_eff
        dec[f"d{i}c1"] = e_s
        dec[f"d{i}c2"] = _entry(
            f"d{i}c2", c2["conv_layer"]["weight"], scales[f"d{i}c1"],
            c2["conv_layer"].get("bias"), _alpha(c2), P.pack_weights2)
        prev = f"d{i}c2"

    head = params["classifier"]["conv_layer"]
    wh = head["weight"].reshape(head["weight"].shape[-2],
                                head["weight"].shape[-1])
    w8h, wsh = quantize_weight_per_oc(_fold_in(wh, scales[prev]))
    q.update(enc)
    q.update(dec)
    q["head"] = {
        "w8": jnp.kron(jnp.eye(8, dtype=jnp.int8), w8h),
        "dq": jnp.tile(wsh, 8).astype(jnp.float32),
        "b": (jnp.tile(jnp.asarray(head["bias"], jnp.float32), 8)
              if head.get("bias") is not None else None),
    }
    return q


def _has_norm(tree):
    if not isinstance(tree, dict):
        return False
    if "norm_layer" in tree:
        return True
    return any(_has_norm(v) for v in tree.values())


def _skip_channels(params, nb, i):
    """Fine channel count of the skip consumed by decoder block i (= the
    out channels of encoder block nb-2-i's conv2)."""
    blk = params["encoder"][f"encoding_blocks__{nb - 2 - i}"]
    return blk["conv2"]["conv_layer"]["weight"].shape[-1]


# ---------------------------------------------------------------------------
# quantized forward
# ---------------------------------------------------------------------------


def _epilogue(y32, e, *, zero_pads, requant=True):
    """int32 conv output -> fused dequant + bias + PReLU (+ shifted-pad
    zeroing) -> int8 requant."""
    y = y32.astype(jnp.float32) * e["dq"]
    if e.get("b") is not None:
        y = y + e["b"]
    if e.get("alpha") is not None:
        y = F.prelu(y, e["alpha"])
    if zero_pads:
        y = P.zero_shifted_pads(y)
    if not requant:
        return y
    return _requant(y, e["rq"])


def _trunk_q(q, x):
    """Fine float input -> ALIGNED packed f32 head logits, all convs int8.
    Mirrors `unet_packed._trunk_v2` site for site."""
    # static under jit: derived from the dict KEYS, not the (traced) "nb"
    # leaf — `range()` over a traced value would fail to trace
    nb = 1 + sum(1 for k in q if k.startswith("e") and k.endswith("c1"))
    x8 = _requant(P.pack2(x).astype(jnp.float32), q["in_rq"])

    skips = []
    for i in range(nb - 1):
        xs = _epilogue(conv_int8(x8, q[f"e{i}c1"]["w8"], [(1, 1)] * 3),
                       q[f"e{i}c1"], zero_pads=True)
        x8 = _epilogue(conv_int8(xs, q[f"e{i}c2"]["w8"], "VALID"),
                       q[f"e{i}c2"], zero_pads=False)
        skips.append(x8)
        x8 = P.maxpool2_packed(x8)  # max commutes with the positive scale

    xs = _epilogue(conv_int8(x8, q["bc1"]["w8"], [(1, 1)] * 3),
                   q["bc1"], zero_pads=True)
    x8 = _epilogue(conv_int8(xs, q["bc2"]["w8"], "VALID"),
                   q["bc2"], zero_pads=False)

    for i in range(nb - 1):
        e = q[f"d{i}c1"]
        skip8 = skips[-(i + 1)]
        y_s = conv_int8(skip8, e["w8"], [(1, 1)] * 3).astype(
            jnp.float32) * e["dq"]
        y_u = upconv_int8(x8, e["w8_u"]).astype(jnp.float32) * e["dq_u"]
        y_u = P.upconv_fix_faces(y_u, x8, e["w_u_fine"],
                                 dequant_scale=jnp.float32(1.0))
        y = y_s + y_u
        if e.get("b") is not None:
            y = y + e["b"]
        if e.get("alpha") is not None:
            y = F.prelu(y, e["alpha"])
        xs = _requant(P.zero_shifted_pads(y), e["rq"])
        x8 = _epilogue(conv_int8(xs, q[f"d{i}c2"]["w8"], "VALID"),
                       q[f"d{i}c2"], zero_pads=False)

    h = q["head"]
    y = jnp.einsum("ndhwi,io->ndhwo", x8, h["w8"],
                   preferred_element_type=jnp.int32).astype(
                       jnp.float32) * h["dq"]
    if h.get("b") is not None:
        y = y + h["b"]
    return y


def packed_unet_apply_v2_int8(q, x):
    """Fine (N,S,S,S,1) float -> fine f32 logits (N,S,S,S,out_classes),
    the int8 counterpart of `packed_unet_apply_v2`."""
    return P.unpack2(_trunk_q(q, x))


def packed_unet_mask_v2_int8(q, x):
    """Fine (N,S,S,S,1) float -> int32 mask (N,S,S,S), the int8 counterpart
    of `packed_unet_mask_v2` (binary models only)."""
    yp = _trunk_q(q, x)
    if yp.shape[-1] != 16:
        raise ValueError("packed_unet_mask_v2_int8 needs out_classes == 2; "
                         f"got {yp.shape[-1] // 8} classes")
    mask = (yp[..., 1::2] > yp[..., 0::2]).astype(jnp.int32)
    return P.unpack2(mask)[..., 0]
