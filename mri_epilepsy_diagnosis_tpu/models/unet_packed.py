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

import jax
import jax.numpy as jnp

from ..ops import functional as F
from ..ops import packed as P


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
        xp = P.maxpool2_packed(xp)

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
    yp = P.conv1_packed(xp, head["weight"], head.get("bias"))
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


def _apply_bn_act(y, params, stats):
    if "norm_layer" in params:
        y = P.batch_norm_packed(
            y, stats["norm_layer"]["running_mean"],
            stats["norm_layer"]["running_var"],
            params["norm_layer"]["weight"], params["norm_layer"]["bias"])
    if "activation_layer" in params:
        y = F.prelu(y, params["activation_layer"]["weight"])
    return y


def _block_as(xp_aligned, params, stats):
    """ConvBlock as an aligned->shifted packed conv (+BN/PReLU, then re-zero
    the shifted pad voxels for the following s->a conv)."""
    wp = P.pack_weights2_as(params["conv_layer"]["weight"])
    y = P.conv3_packed_as(xp_aligned, wp, params["conv_layer"].get("bias"))
    return P.zero_shifted_pads(_apply_bn_act(y, params, stats))


def _block_sa(xs, params, stats):
    """ConvBlock as a shifted->aligned packed conv (+BN/PReLU)."""
    wp = P.pack_weights2(params["conv_layer"]["weight"])
    y = P.conv3_packed(xs, wp, params["conv_layer"].get("bias"))
    return _apply_bn_act(y, params, stats)


def packed_unet_apply_v2(variables, x, num_encoding_blocks: int = 3):
    """Fine (N,S,S,S,1) -> logits (N,S,S,S,out_classes), matching
    `UNet3D(...).apply(variables, x)` (eval mode), zero repacks."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    nb = num_encoding_blocks

    xp = P.pack2(x)
    skips = []
    for i in range(nb - 1):
        blk = params["encoder"][f"encoding_blocks__{i}"]
        bst = stats.get("encoder", {}).get(f"encoding_blocks__{i}", {})
        xs = _block_as(xp, blk["conv1"], bst.get("conv1", {}))
        xp = _block_sa(xs, blk["conv2"], bst.get("conv2", {}))
        skips.append(xp)
        xp = P.maxpool2_packed(xp)

    blk = params["bottom_block"]
    bst = stats.get("bottom_block", {})
    xs = _block_as(xp, blk["conv1"], bst.get("conv1", {}))
    xp = _block_sa(xs, blk["conv2"], bst.get("conv2", {}))

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
        xs = P.zero_shifted_pads(y)
        xp = _block_sa(xs, blk["conv2"], bst.get("conv2", {}))

    head = params["classifier"]["conv_layer"]
    yp = P.conv1_packed(xp, head["weight"], head.get("bias"))
    return P.unpack2(yp)
