"""Packed-layout (space-to-depth) inference path for the flagship UNet3D.

Runs the exact UNet3D forward — same variables, same numerics up to bf16
contraction order — entirely in the packed (N, S/2, S/2, S/2, 8C) layout of
`ops.packed`, which removes the 8-16x lane-padding HBM tax that dominates
the channels-last forward at 192^3 (see ops/packed.py docstring and
experiments/profile_192.py).  Eval-mode only (BatchNorm running stats).

Usage:
    model = UNet3D(out_channels_first_layer=8)
    variables = ...  # trained / imported
    logits = packed_unet_apply(variables, x)   # == model.apply(variables, x)
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..ops import functional as F
from ..ops import packed as P


def _maxpool(xp):
    """Env-pinned maxpool formulation.  Full-graph A/B at b8 192^3
    (experiments/infer_variants_ab.py, round 3): `reshape` (sub-axis
    reshape + reduce_max) 228.1 ms/step vs `cascade` (three lane-block
    halvings) 232.1 — the 3.6 GB relayout copy the reshape forces is
    cheaper than the cascade's extra full-tensor max passes, so reshape
    stays the default."""
    if os.environ.get("MRI_TPU_MAXPOOL", "reshape") == "cascade":
        return P.maxpool2_packed_cascade(xp)
    return P.maxpool2_packed(xp)


def _head_conv(xp, head):
    """Env-pinned classifier-head formulation.  Same A/B: `blockdiag`
    (kron(I_8, w) dot, no sub-axis reshape, keeps the lane-major layout)
    226.0 ms/step vs `reshape` (per-sub einsum over a (…, 8, Ci) view)
    228.1 — blockdiag is the default."""
    fn = (P.conv1_packed
          if os.environ.get("MRI_TPU_HEAD", "blockdiag") == "reshape"
          else P.conv1_packed_blockdiag)
    return fn(xp, head["weight"], head.get("bias"))


def _conv_block_packed(xp_aligned, params, stats, *, first=False,
                       shifted_input=None):
    """ConvBlock (conv3 + optional BN + PReLU) on packed activations.

    `xp_aligned` is the aligned packed input; the shifted form is derived
    here (or passed in for the network input, which is packed directly from
    fine layout)."""
    xs = (P.repack_shifted(xp_aligned) if shifted_input is None
          else shifted_input)
    wp = P.pack_weights2(params["conv_layer"]["weight"])
    y = P.conv3_packed(xs, wp, params["conv_layer"].get("bias"))
    if "norm_layer" in params:
        y = P.batch_norm_packed(
            y, stats["norm_layer"]["running_mean"],
            stats["norm_layer"]["running_var"],
            params["norm_layer"]["weight"], params["norm_layer"]["bias"])
    if "activation_layer" in params:
        y = F.prelu(y, params["activation_layer"]["weight"])
    return y


def packed_unet_apply(variables, x, num_encoding_blocks: int = 3):
    """Fine (N, S, S, S, 1) -> logits (N, S, S, S, out_classes), matching
    `UNet3D(...).apply(variables, x)` (eval mode).  S must be divisible by
    2^num_encoding_blocks."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    nb = num_encoding_blocks

    # ---- encoder
    skips = []
    xp = None
    shifted0 = P.pack2_shifted(x)
    for i in range(nb - 1):
        blk = params["encoder"][f"encoding_blocks__{i}"]
        bst = stats.get("encoder", {}).get(f"encoding_blocks__{i}", {})
        xp = _conv_block_packed(xp, blk["conv1"], bst.get("conv1", {}),
                                shifted_input=shifted0 if i == 0 else None)
        shifted0 = None
        xp = _conv_block_packed(xp, blk["conv2"], bst.get("conv2", {}))
        skips.append(xp)
        xp = _maxpool(xp)

    # ---- bottom block
    blk = params["bottom_block"]
    bst = stats.get("bottom_block", {})
    xp = _conv_block_packed(xp, blk["conv1"], bst.get("conv1", {}))
    xp = _conv_block_packed(xp, blk["conv2"], bst.get("conv2", {}))

    # ---- decoder
    for i in range(nb - 1):
        blk = params["decoder"][f"decoding_blocks__{i}"]
        bst = stats.get("decoder", {}).get(f"decoding_blocks__{i}", {})
        up = P.upsample2_packed(xp)
        xp = P.concat_channels_packed(skips[-(i + 1)], up)
        xp = _conv_block_packed(xp, blk["conv1"], bst.get("conv1", {}))
        xp = _conv_block_packed(xp, blk["conv2"], bst.get("conv2", {}))

    # ---- classifier (1x1x1)
    head = params["classifier"]["conv_layer"]
    yp = _head_conv(xp, head)
    return P.unpack2(yp)


# ---------------------------------------------------------------------------
# v2: alternating aligned->shifted / shifted->aligned convs + fused decoder
#
# Round-2 TPU profiling (experiments/roofline.py, xla_probe2.py) showed v1's
# repack_shifted and trilinear upsample dominating (13-25x off HBM roofline:
# sub-bit reshapes force thin-lane relayouts).  v2 removes every repack by
# alternating conv parities (ops/packed.py `pack_weights2_as`) and composes
# upsample+concat+conv1 of each decoder block into a transposed packed conv
# (`upconv_packed`, ~100 TFLOP/s on this TPU vs 82 GB/s for the standalone
# resize) with exact face corrections.  Same variables, same numerics.
# ---------------------------------------------------------------------------


def fold_bn_inference(variables, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding conv's weights/bias.

    BN running statistics live in the variables pytree, which jit treats as
    *arguments* — XLA cannot constant-fold them away.  Folding once at the
    variables level collapses every conv+BN pair to a conv with scaled
    weights and an adjusted bias: with s = gamma / sqrt(var + eps),

        BN(conv(x, W) + b) == conv(x, W * s) + (b * s + beta - mean * s).

    Returns a `{"params": ...}` pytree with every `norm_layer` removed and
    no `batch_stats`, consumable by all packed-v2 inference entry points
    (`_apply_bn_act`/`_conv_block_packed` skip BN when the key is absent;
    the decoder's w1 split/scale commute with the per-out-channel fold).
    Inference only — training needs live batch statistics.  eps matches
    `ops.packed.batch_norm_packed`.
    """
    stats = variables.get("batch_stats", {})

    def _fold(params, st):
        if not isinstance(params, dict):
            return params
        out = {}
        for k, v in params.items():
            sub = st.get(k, {}) if isinstance(st, dict) else {}
            if isinstance(v, dict) and "conv_layer" in v and "norm_layer" in v:
                nl, nst = v["norm_layer"], sub.get("norm_layer", {})
                s = nl["weight"] / jnp.sqrt(nst["running_var"] + eps)
                conv = dict(v["conv_layer"])
                conv["weight"] = conv["weight"] * s
                b = conv.get("bias")
                conv["bias"] = ((b * s if b is not None else 0.0)
                                + nl["bias"] - nst["running_mean"] * s)
                out[k] = {"conv_layer": conv,
                          **{kk: vv for kk, vv in v.items()
                             if kk not in ("conv_layer", "norm_layer")}}
            else:
                out[k] = _fold(v, sub) if isinstance(v, dict) else v
        return out

    return {"params": _fold(variables["params"], stats)}


def _apply_bn_act(y, params, stats):
    if "norm_layer" in params:
        y = P.batch_norm_packed(
            y, stats["norm_layer"]["running_mean"],
            stats["norm_layer"]["running_var"],
            params["norm_layer"]["weight"], params["norm_layer"]["bias"])
    if "activation_layer" in params:
        y = F.prelu(y, params["activation_layer"]["weight"])
    return y


_PALLAS_EPILOGUE = os.environ.get("MRI_TPU_PALLAS_EPILOGUE", "0") == "1"


def _block_as(xp_aligned, params, stats):
    """ConvBlock as an aligned->shifted packed conv (+BN/PReLU, then re-zero
    the shifted pad voxels for the following s->a conv).

    MRI_TPU_PALLAS_EPILOGUE=1 swaps the XLA BN+PReLU+pad-mask tail for the
    compiled Mosaic kernel `ops.pallas_kernels.bn_act_zero_pads` (inference
    only — no VJP) for the full-graph A/B (experiments/pallas_ab.py)."""
    wp = P.pack_weights2_as(params["conv_layer"]["weight"])
    y = P.conv3_packed_as(xp_aligned, wp, params["conv_layer"].get("bias"))
    if (_PALLAS_EPILOGUE and "norm_layer" in params
            and "activation_layer" in params):
        from ..ops.pallas_kernels import bn_act_zero_pads

        gamma = params["norm_layer"]["weight"]
        beta = params["norm_layer"]["bias"]
        mean = stats["norm_layer"]["running_mean"]
        var = stats["norm_layer"]["running_var"]
        scale = P.tile_channel_param(gamma / jnp.sqrt(var + 1e-5))
        shift = (P.tile_channel_param(beta)
                 - P.tile_channel_param(mean) * scale)
        alpha = P.tile_channel_param(
            jnp.broadcast_to(params["activation_layer"]["weight"],
                             (y.shape[-1] // 8,)))
        c8 = y.shape[-1]
        masks = [jnp.asarray(P._shifted_pad_axis_mask(a, y.shape[1 + a], c8))
                 for a in range(3)]
        return bn_act_zero_pads(y, scale, shift, alpha, masks)
    return P.zero_shifted_pads(_apply_bn_act(y, params, stats))


def _block_sa(xs, params, stats):
    """ConvBlock as a shifted->aligned packed conv (+BN/PReLU)."""
    wp = P.pack_weights2(params["conv_layer"]["weight"])
    y = P.conv3_packed(xs, wp, params["conv_layer"].get("bias"))
    return _apply_bn_act(y, params, stats)


def packed_unet_apply_v2(variables, x, num_encoding_blocks: int = 3):
    """Fine (N,S,S,S,1) -> logits (N,S,S,S,out_classes), matching
    `UNet3D(...).apply(variables, x)` (eval mode), zero repacks."""
    return P.unpack2(_trunk_v2(variables, x, num_encoding_blocks))


def packed_unet_mask_v2(variables, x, num_encoding_blocks: int = 3):
    """Fine (N,S,S,S,1) -> int32 mask (N,S,S,S), equal to
    `argmax(packed_unet_apply_v2(...), -1)` for out_classes == 2.

    The argmax epilogue on fine logits costs ~14 ms/step (iota+reduce) plus
    the full 2-class unpack2 transpose at b16 192^3
    (experiments/infer_copy_hunt.py round 3); comparing the class channel
    pairs in packed space (l1 > l0 — same tie-breaking as argmax, which
    keeps class 0 on ties) and unpacking the 1-channel mask instead halves
    the epilogue traffic.  Inference-only (the strided channel slices would
    cost pad-VJPs under autodiff)."""
    yp = _trunk_v2(variables, x, num_encoding_blocks)
    if yp.shape[-1] != 16:
        raise ValueError("packed_unet_mask_v2 needs out_classes == 2; got "
                         f"{yp.shape[-1] // 8} classes")
    mask = (yp[..., 1::2] > yp[..., 0::2]).astype(jnp.int32)
    return P.unpack2(mask)[..., 0]


def _trunk_v2(variables, x, num_encoding_blocks: int = 3, tap=None):
    """Shared v2 forward: fine input -> ALIGNED packed head output.

    `tap(name, tensor) -> tensor` is an optional identity hook called at
    every conv-input site (the int8 calibration pass records per-site
    absmax through it — see models/unet_packed_q.py)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    nb = num_encoding_blocks
    t = (lambda name, v: v) if tap is None else tap

    xp = t("in", P.pack2(x))
    skips = []
    for i in range(nb - 1):
        blk = params["encoder"][f"encoding_blocks__{i}"]
        bst = stats.get("encoder", {}).get(f"encoding_blocks__{i}", {})
        xs = t(f"e{i}c1", _block_as(xp, blk["conv1"], bst.get("conv1", {})))
        xp = t(f"e{i}c2", _block_sa(xs, blk["conv2"], bst.get("conv2", {})))
        skips.append(xp)
        xp = _maxpool(xp)

    blk = params["bottom_block"]
    bst = stats.get("bottom_block", {})
    xs = t("bc1", _block_as(xp, blk["conv1"], bst.get("conv1", {})))
    xp = t("bc2", _block_sa(xs, blk["conv2"], bst.get("conv2", {})))

    for i in range(nb - 1):
        blk = params["decoder"][f"decoding_blocks__{i}"]
        bst = stats.get("decoder", {}).get(f"decoding_blocks__{i}", {})
        skip = skips[-(i + 1)]
        c_skip = skip.shape[-1] // 8
        w1 = blk["conv1"]["conv_layer"]["weight"]
        w_s, w_u = w1[:, :, :, :c_skip, :], w1[:, :, :, c_skip:, :]
        y_s = P.conv3_packed_as(skip, P.pack_weights2_as(w_s),
                                blk["conv1"]["conv_layer"].get("bias"))
        y_u = P.upconv_packed(xp, P.pack_upconv_weights(w_u))
        y_u = P.upconv_fix_faces(y_u, xp, w_u)
        y = _apply_bn_act(y_s + y_u, blk["conv1"], bst.get("conv1", {}))
        xs = t(f"d{i}c1", P.zero_shifted_pads(y))
        xp = t(f"d{i}c2", _block_sa(xs, blk["conv2"], bst.get("conv2", {})))

    head = params["classifier"]["conv_layer"]
    return _head_conv(xp, head)


# ---------------------------------------------------------------------------
# training in packed layout
#
# The fine 192^3 train graph crashes this platform's remote compiler even
# with layer-wise remat (experiments/train192_probe.py).  The packed layout
# runs the same network at 96^3 cells with 128-lane channels — a graph the
# compiler handles — and is the fast execution layout anyway.  BatchNorm
# batch statistics are computed exactly as the fine layout would: per-fine-
# channel sums fold the 8 sub-position blocks, and shifted tensors mask
# their pad voxels (fine -1 / S) out of the counts.
# ---------------------------------------------------------------------------


def _bn_train_packed(y, params, old_stats, *, pad_entries, valid,
                     momentum=0.1, eps=1e-5):
    """Normalize packed `y` with its own (fine-exact) batch statistics.

    `y` must have pad voxels already zeroed (shifted layout) or none
    (aligned).  `valid` = number of fine voxels per channel (N*S^3);
    `pad_entries` = number of zeroed pad entries per fine channel.
    Returns (normalized y, new {running_mean, running_var}) matching
    `ops.layers.BatchNorm` train-mode numerics (biased var to normalize,
    unbiased var into the running stats, torch momentum)."""
    yf = y.astype(jnp.float32)
    c8 = y.shape[-1]
    c = c8 // 8
    # one fused pass: E[x] and E[x^2] (zeroed pad entries add nothing to
    # either sum, so only `valid` divides them).  var = E[x^2] - E[x]^2 is
    # algebraically the reference's centered sum; the earlier centered
    # formulation materialized a full f32 diff tensor per BN layer.
    s1 = jnp.sum(yf, axis=(0, 1, 2, 3)).reshape(8, c).sum(0)
    s2 = jnp.sum(yf * yf, axis=(0, 1, 2, 3)).reshape(8, c).sum(0)
    mean = s1 / valid
    # f32 cancellation can round E[x^2]-E[x]^2 slightly negative for a
    # near-constant channel with large mean; rsqrt(var+eps) would then NaN
    var = jnp.maximum(s2 / valid - mean * mean, 0.0)
    del pad_entries  # implicit: pads contribute zero to both sums
    out = F.batch_norm(y, jnp.tile(mean, 8), jnp.tile(var, 8),
                       P.tile_channel_param(params["weight"]),
                       P.tile_channel_param(params["bias"]), eps)
    unbiased = var * (valid / max(valid - 1.0, 1.0))
    m = momentum
    new_stats = {
        "running_mean": (1 - m) * old_stats["running_mean"] + m * mean,
        "running_var": (1 - m) * old_stats["running_var"] + m * unbiased,
    }
    return out, new_stats


def _block_train(y, params, stats, *, shifted, fine_size, batch):
    """Shared BN+PReLU train-mode tail for a ConvBlock whose conv output is
    `y` (shifted or aligned packed).  Returns (activated y, new stats)."""
    new = {}
    if shifted:
        y = P.zero_shifted_pads(y)
    if "norm_layer" in params:
        valid = float(batch) * fine_size ** 3
        pads = (float(batch) * 8.0 * (fine_size // 2 + 1) ** 3 - valid
                if shifted else 0.0)
        y, new["norm_layer"] = _bn_train_packed(
            y, params["norm_layer"], stats["norm_layer"],
            pad_entries=pads, valid=valid)
    if "activation_layer" in params:
        y = F.prelu(y, params["activation_layer"]["weight"])
    if shifted:
        y = P.zero_shifted_pads(y)
    return y, new


def packed_unet_train_apply(variables, x, num_encoding_blocks: int = 3,
                            remat: bool = False, dec_up: str = "explicit"):
    """Train-mode packed-v2 forward: fine (N,S,S,S,1) -> (packed logits
    (N,S/2,S/2,S/2,8*out_classes), new batch_stats pytree).  Matches
    `UNet3D(...).apply(..., train=True, mutable=["batch_stats"])` numerics
    (BN normalizes with the batch statistics and returns updated running
    stats).

    `dec_up` picks the decoder up-branch formulation:
      - "explicit": `upsample2_packed` + a k=2 packed conv.  Training
        default: the composed 5^3 kernel burns ~37x the conceptual conv
        FLOPs, a good trade for the HBM-bound inference forward but not for
        training, where autodiff triples it — its dw alone is the top two
        ops of the round-3 train profile (~31 ms of a 292 ms f32 b1 step),
        while the explicit form's dw runs through the fast qgroup path and
        needs no face corrections (exact by construction).
      - "composed": the inference formulation (`upconv_packed` +
        `upconv_fix_faces`), kept for A/B.
      - "hybrid": composed forward with the hand-rolled VJP of
        `ops.packed.upconv_core_hybrid` (qgroup dw over the upsampled
        input instead of XLA's dense 5^3 kernel gradient)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    nb = num_encoding_blocks
    n, s = x.shape[0], x.shape[1]
    # built to mirror `stats`' tree structure exactly (blocks without a
    # norm layer — enc0.conv1, the classifier — contribute no key)
    new_stats = {"encoder": {}, "decoder": {}}

    def _put(tree, key, ns1, ns2):
        d = {}
        if ns1:
            d["conv1"] = ns1
        if ns2:
            d["conv2"] = ns2
        tree[key] = d

    def conv_as(xp, blk):
        return P.conv3_packed_as(xp, P.pack_weights2_as(
            blk["conv_layer"]["weight"]), blk["conv_layer"].get("bias"))

    def conv_sa(xs, blk):
        return P.conv3_packed(xs, P.pack_weights2(
            blk["conv_layer"]["weight"]), blk["conv_layer"].get("bias"))

    # layer-wise rematerialization: recompute each two-conv block in the
    # backward instead of keeping its activations live (shrinks the autodiff
    # graph/live set for whole-volume batches)
    wrap = jax.checkpoint if remat else (lambda f: f)

    def _double_block(xp, blk, bst, s):
        y, ns1 = _block_train(conv_as(xp, blk["conv1"]), blk["conv1"],
                              bst.get("conv1", {}), shifted=True,
                              fine_size=s, batch=n)
        out, ns2 = _block_train(conv_sa(y, blk["conv2"]), blk["conv2"],
                                bst.get("conv2", {}), shifted=False,
                                fine_size=s, batch=n)
        return out, ns1, ns2

    def _dec_block(xp, skip, blk, bst, s):
        c_skip = skip.shape[-1] // 8
        w1 = blk["conv1"]["conv_layer"]["weight"]
        w_s, w_u = w1[:, :, :, :c_skip, :], w1[:, :, :, c_skip:, :]
        y_s = P.conv3_packed_as(skip, P.pack_weights2_as(w_s),
                                blk["conv1"]["conv_layer"].get("bias"))
        if dec_up == "explicit":
            up = P.upsample2_packed(xp)
            y_u = P.conv3_packed_as(up, P.pack_weights2_as(w_u))
        elif dec_up == "hybrid":
            # composed forward, qgroup-dw backward (see upconv_core_hybrid)
            y_u = P.upconv_core_hybrid(xp, w_u)
            y_u = P.upconv_fix_faces(y_u, xp, w_u)
        else:
            y_u = P.upconv_packed(xp, P.pack_upconv_weights(w_u))
            y_u = P.upconv_fix_faces(y_u, xp, w_u)
        y, ns1 = _block_train(y_s + y_u, blk["conv1"], bst.get("conv1", {}),
                              shifted=True, fine_size=s, batch=n)
        out, ns2 = _block_train(conv_sa(y, blk["conv2"]), blk["conv2"],
                                bst.get("conv2", {}), shifted=False,
                                fine_size=s, batch=n)
        return out, ns1, ns2

    xp = P.pack2(x)
    skips = []
    for i in range(nb - 1):
        key = f"encoding_blocks__{i}"
        xp, ns1, ns2 = wrap(functools.partial(_double_block, s=s))(
            xp, params["encoder"][key], stats["encoder"].get(key, {}))
        _put(new_stats["encoder"], key, ns1, ns2)
        skips.append(xp)
        xp = _maxpool(xp)
        s //= 2

    xp, ns1, ns2 = wrap(functools.partial(_double_block, s=s))(
        xp, params["bottom_block"], stats["bottom_block"])
    _put(new_stats, "bottom_block", ns1, ns2)

    for i in range(nb - 1):
        key = f"decoding_blocks__{i}"
        s *= 2
        xp, ns1, ns2 = wrap(functools.partial(_dec_block, s=s))(
            xp, skips[-(i + 1)], params["decoder"][key],
            stats["decoder"].get(key, {}))
        _put(new_stats["decoder"], key, ns1, ns2)

    head = params["classifier"]["conv_layer"]
    yp = _head_conv(xp, head)
    return yp, new_stats


def packed_dice_loss(logits_packed, targets_fine):
    """Soft dice loss from PACKED logits and fine targets — the sub-position
    axis is folded into a spatial axis (dice is a voxel sum, so layout is
    irrelevant as long as probs and targets align).  The targets are packed
    with the identity stride-2 conv (`ops.packed.pack2_conv`), NOT pack2:
    the transpose pack materializes its (N, D/2, 2, ..., 2, 1) intermediate
    with a 2-element axis lane-padded to 128 — a 64x expansion, 1.7 GB per
    192^3 volume and the single largest allocation of the packed train
    graph (the batch-3 HBM OOM, experiments/midpoint_probe.py round 3).

    Binary (0/1 float) targets for out_classes == 2, integer class labels
    otherwise.

    History (round 3): the first fix replaced pack2 with per-sub-position
    strided target views — memory-clean but 47 ms/step SLOWER at b2 (the
    VJP of each of the 8 logit channel slices is a zero-pad back to the
    full 128 channels: eight extra full-tensor passes in the backward).
    The identity-conv pack keeps the single-softmax formulation (no logit
    slices, so the backward is untouched) and targets carry no gradient,
    so the conv has no VJP cost either."""
    from ..metrics.dice import get_dice_loss

    n, d2, h2, w2, c8 = logits_packed.shape
    co = c8 // 8
    probs = jax.nn.softmax(
        logits_packed.reshape(n, d2, h2, w2, 8, co), axis=-1)
    probs = probs.reshape(n, d2, h2, w2 * 8, co)
    tp = P.pack2_conv(targets_fine.astype(jnp.float32)).reshape(
        n, d2, h2, w2 * 8, 1)
    if co == 2:
        onehot = jnp.concatenate([1.0 - tp, tp], axis=-1)
    else:
        onehot = jax.nn.one_hot(tp[..., 0].astype(jnp.int32), co,
                                dtype=probs.dtype)
    return jnp.mean(get_dice_loss(probs, onehot, spatial_dimensions=(1, 2, 3)))
