"""Packed-layout (space-to-depth) execution path for VoxResNet.

The r4 profile of the 192^3 VoxResNet train step (docs/PERFORMANCE.md) shows
48% of the step in thin-lane reduce fusions: XLA's conv dw and the BatchNorm
batch statistics both reduce over C=32 channels-last activations — 25% lane
occupancy at every one of the millions of (8,128) tiles.  Running the trunk
in the packed layout of `ops.packed` (8C = 256 lanes) removes that tax the
same way it did for the UNet (ops/packed.py docstring).

VoxResNet's geometry maps onto the zero-repack alternating scheme cleanly:

- the stem conv (k=3, stride 2) packs *into* the layout — one fused k=5/
  stride-4 conv emits the SHIFTED packing directly (`conv_input_packed_s2`);
- `conv3d_2` runs shifted->aligned; every residual block alternates
  aligned->shifted->aligned (`conv3_packed_as` / `conv3_packed`), so the
  identity skip adds in the aligned layout with no conversion;
- every downsample conv (k=3, stride 2) consumes ALIGNED and emits ALIGNED
  at the next scale via the 8-phase shared-kernel form (`conv3s2_packed_aa`,
  64/27 of the fine FLOPs — the pack2 ratio);
- BatchNorm batch statistics are computed fine-exactly by folding the 8
  sub-position blocks (`unet_packed._bn_train_packed`), over 256-lane
  tensors instead of 32.

Same `variables` pytree as `models.cnn.VoxResNet` (torch-parity names), same
numerics up to contraction order; dropout draws from the caller's rng key
directly instead of flax's module-path-derived stream, so train-mode
dropout masks differ from `model.apply` (same distribution — eval and
dropout=0 paths are bit-comparable, tests/test_voxresnet_packed.py).

Reference: classification/models/cnn_model.py:43-101 (VoxResNet),
full_sample_classification.ipynb cell 21 (the 60.1 s P100 training epoch
this path is benchmarked against).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import functional as F
from ..ops import packed as P
from .unet_packed import _bn_train_packed

# Gradient rules for the k=2 packed convs: XLA's own conv gradients win at
# the VoxResNet b10 classification shapes (48.7 vs 34.1 vol/s, and the
# custom-VJP graph with the pack4 stem wedges the remote compiler) —
# opposite of the 192^3 b1/b2 seg-training shapes where the qgroup VJPs
# are ~2x faster (experiments/voxresnet_packed_ab.py r5 vs bwd_profile r2).
_CUSTOM_VJP = os.environ.get("MRI_TPU_VOX_VJP", "xla") == "qgroup"


def _relu(x):
    return jnp.maximum(x, 0)


def _bn_packed(y, params, stats, *, train, shifted, fine_size, batch):
    """BatchNorm on a packed tensor (shifted or aligned).

    Returns (normalized y, new running stats or None).  Train mode zeroes
    shifted pad voxels first so they stay out of the batch statistics
    (`_bn_train_packed` contract); eval mode is elementwise, so pads are
    whatever the conv left there — callers re-zero after the activation."""
    if train:
        if shifted:
            y = P.zero_shifted_pads(y)
        valid = float(batch) * float(fine_size) ** 3
        pads = (float(batch) * 8.0 * (fine_size // 2 + 1) ** 3 - valid
                if shifted else 0.0)
        return _bn_train_packed(y, params, stats, pad_entries=pads,
                                valid=valid)
    out = P.batch_norm_packed(y, stats["running_mean"], stats["running_var"],
                              params["weight"], params["bias"])
    return out, None


def _basic_block_packed(xp, params, stats, *, train, fine_size, batch):
    """BasicBlock (conv-bn-relu-conv-bn + identity, relu) on ALIGNED packed
    input, returning ALIGNED packed output (models/cnn.py::BasicBlock)."""
    new = {}
    y = P.conv3_packed_as(xp, P.pack_weights2_as(params["conv1"]["weight"]),
                          custom_vjp=_CUSTOM_VJP)
    y, ns = _bn_packed(y, params["bn1"], stats["bn1"], train=train,
                       shifted=True, fine_size=fine_size, batch=batch)
    if ns is not None:
        new["bn1"] = ns
    y = P.zero_shifted_pads(_relu(y))
    y = P.conv3_packed(y, P.pack_weights2(params["conv2"]["weight"]),
                       custom_vjp=_CUSTOM_VJP)
    y, ns = _bn_packed(y, params["bn2"], stats["bn2"], train=train,
                       shifted=False, fine_size=fine_size, batch=batch)
    if ns is not None:
        new["bn2"] = ns
    return _relu(y + xp), new


def voxresnet_apply_packed(model, variables, x, *, train=False, rng=None):
    """Packed-layout forward of `models.cnn.VoxResNet`.

    model:     the VoxResNet instance (configuration source: stride,
               n_blocks, dropout, input_shape, ...).
    variables: the fine model's pytree ({"params", "batch_stats"}).
    x:         fine (N, S, S, S, 1); S // stride must be divisible by
               2**(n_blocks+1) (packed cells stay even at every scale).
    Returns (logits (N, num_classes), new batch_stats pytree when train
    else None).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if model.stride not in (1, 2):
        raise ValueError(f"packed VoxResNet supports stride 1/2, got "
                         f"{model.stride}")
    n = x.shape[0]
    s = x.shape[1]
    new_stats = {}

    def bn(y, name, *, shifted, fine_size):
        out, ns = _bn_packed(y, params[name], stats[name], train=train,
                             shifted=shifted, fine_size=fine_size, batch=n)
        if ns is not None:
            new_stats[name] = ns
        return out

    def block(xp, name, fine_size):
        out, ns = _basic_block_packed(xp, params[name], stats[name],
                                      train=train, fine_size=fine_size,
                                      batch=n)
        if ns:
            new_stats[name] = ns
        return out

    # ---- stem: fine input -> SHIFTED packing in one fused conv
    w1 = params["model__conv3d_1"]["weight"]
    b1 = params["model__conv3d_1"].get("bias")
    if model.stride == 2:
        # pack4 + k2-dense form: 2x the fused-k5 stem's step share
        # (experiments/voxresnet_stem_ab.py); MRI_TPU_VOX_STEM=k5 restores
        # the fused k5/s4 form for A/B
        if os.environ.get("MRI_TPU_VOX_STEM", "p4") == "k5":
            y = P.conv_input_packed_s2(x, P.pack_input_weights_s2(w1), b1)
        else:
            y = P.conv_input_packed_s2_p4(
                x, P.pack_input_weights_s2_p4(w1), b1)
        f = s // 2
    else:
        y = P.conv_input_packed(x, P.pack_input_weights(w1), b1)
        f = s
    y = bn(y, "model__batch_norm_1", shifted=True, fine_size=f)
    y = P.zero_shifted_pads(_relu(y))
    xp = P.conv3_packed(y, P.pack_weights2(params["model__conv3d_2"]["weight"]),
                        params["model__conv3d_2"].get("bias"),
                        custom_vjp=_CUSTOM_VJP)
    xp = _relu(bn(xp, "model__batch_norm_2", shifted=False, fine_size=f))

    # ---- stages: downsample (aligned->aligned) + 2 blocks + stage BN
    stages = [("model__conv3d_3", "model__block_1", "model__block_2",
               "model__batch_norm_3")]
    if model.n_blocks >= 2:
        stages.append(("model__conv3d_4", "model__block_3", "model__block_4",
                       "model__batch_norm_4"))
    if model.n_blocks >= 3:
        stages.append(("model__conv3d_5", "model__block_5", "model__block_6",
                       "model__batch_norm_5"))
    if model.n_blocks >= 4:
        stages.append(("model__conv3d_6", "model__block_7", "model__block_8",
                       "model__batch_norm_6"))
    for conv_name, blk_a, blk_b, bn_name in stages:
        xp = P.conv3s2_packed_aa(
            xp, P.pack_weights2_s2(params[conv_name]["weight"]),
            params[conv_name].get("bias"))
        f //= 2
        xp = block(xp, blk_a, f)
        xp = block(xp, blk_b, f)
        xp = _relu(bn(xp, bn_name, shifted=False, fine_size=f))

    # ---- head (tiny: f^3 voxels) — back to fine, torch flatten order
    fine = P.unpack2(xp)
    flat = jnp.moveaxis(fine, -1, 1).reshape(n, -1)
    fc1 = params["model__fully_conn_1"]
    h = F.dense(flat, fc1["weight"].astype(flat.dtype), fc1.get("bias"))
    if model.n_blocks < 4:
        # reference quirk: "activation_6" is registered twice for
        # n_blocks >= 4, so no activation after fully_conn_1 there
        # (models/cnn.py:57 docstring)
        h = _relu(h)
    if train and model.dropout > 0.0:
        if rng is None:
            raise ValueError("train-mode dropout needs an rng key")
        keep = 1.0 - model.dropout
        mask = jax.random.bernoulli(rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    fc2 = params["model__fully_conn_2"]
    logits = F.dense(h, fc2["weight"].astype(h.dtype), fc2.get("bias"))
    return logits, (new_stats if train else None)


@functools.partial(jax.jit, static_argnames=("model",), donate_argnums=(0,))
def voxresnet_class_step_packed(state, x, y, rng, *, model):
    """`train.classification._class_step` (train mode) through the packed
    VoxResNet forward: CE loss on logits, BN batch statistics fine-exact.
    Returns (state, loss, probs) — same contract as `_class_step`."""
    from ..train.classification import cross_entropy

    def loss_fn(p):
        logits, bs = voxresnet_apply_packed(
            model, {"params": p, "batch_stats": state.batch_stats},
            x, train=True, rng=rng)
        return cross_entropy(logits, y), (logits, bs)

    (loss, (outputs, bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads, new_batch_stats=bs)
    return state, loss, jax.nn.softmax(outputs, axis=-1)
