"""Gradient-accumulation train steps (scan over microbatches).

This platform's remote TPU compiler rejects several large whole-batch train
graphs that the reference runs natively on GPU: packed 192^3 segmentation at
batch >= 4 and DilatedCNN 180^3 classification at the reference's batch 10
(`baseline_sample_classification.ipynb` cell 28) both fail with HTTP 500.
Instead of a flat batch-B graph, these steps `lax.scan` a microbatch-sized
body B/micro times and apply the summed (mean) gradients once — XLA compiles
ONE microbatch graph regardless of the effective batch, so any batch the
microbatch shape supports becomes reachable.

Semantics vs the flat step:

- Gradients: mathematically identical to the flat batch for any loss that is
  a mean of equal-sized microbatch means (dice mean over batch, unweighted
  cross-entropy).  Verified to float tolerance in tests/test_accum.py.
- BatchNorm: *train-mode normalization* uses each microbatch's own
  statistics (like sequential small batches — exactly the reference's
  semantics at its whole-volume batch 1); running stats thread through the
  scan.  `micro=B` reproduces the flat step up to scan-body fusion
  rounding (the scan body compiles as its own computation, so f32
  contraction order differs slightly from the inlined graph).
- Dropout/sampling rngs: one fresh key per microbatch via `jax.random.split`
  (the microbatch graph is small enough that in-graph threefry is safe —
  the crash documented in CLAUDE.md only hits large graphs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .state import TrainState


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_zeros(t):
    return jax.tree.map(jnp.zeros_like, t)


def _split_micro(arr, n):
    """(B, ...) -> (n, B/n, ...) leading microbatch axis for scan."""
    return arr.reshape(n, arr.shape[0] // n, *arr.shape[1:])


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3, 4))
def _packed_seg_accum(state: TrainState, inputs, raw_labels, micro: int,
                      remat: bool):
    from ..models.unet_packed import packed_dice_loss, packed_unet_train_apply
    from ..transforms.labels import binarize_segmentation

    n = inputs.shape[0] // micro
    xs = _split_micro(inputs, n)
    ys = _split_micro(raw_labels, n)

    def body(carry, xy):
        gsum, lsum, bs = carry
        x, y = xy
        targets = binarize_segmentation(y)

        def loss_fn(p):
            logits_p, nbs = packed_unet_train_apply(
                {"params": p, "batch_stats": bs}, x, remat=remat)
            return packed_dice_loss(logits_p, targets), nbs

        (loss, nbs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return (_tree_add(gsum, grads), lsum + loss, nbs), None

    carry0 = (_tree_zeros(state.params), jnp.float32(0.0), state.batch_stats)
    (gsum, lsum, bs), _ = lax.scan(body, carry0, (xs, ys))
    inv = jnp.float32(1.0 / n)
    grads = jax.tree.map(lambda g: g * inv, gsum)
    state = state.apply_gradients(grads, new_batch_stats=bs)
    return state, lsum * inv


def packed_seg_train_step_accum(state: TrainState, inputs, raw_labels,
                                micro: int = 1, remat: bool = False):
    """`packed_seg_train_step` for effective batches the compiler rejects
    flat: scan over `micro`-sized microbatches (batch % micro == 0), one
    optimizer step on the mean gradient.  micro=B matches the flat step to
    rounding; micro=1 makes 192^3 batch-4 training reachable (the flat
    b4 graph crashes the remote compiler — experiments/train192_probe.py)."""
    if inputs.shape[0] % micro:
        raise ValueError(
            f"batch {inputs.shape[0]} not divisible by micro={micro}")
    return _packed_seg_accum(state, inputs, raw_labels, micro, remat)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
def _class_accum(state: TrainState, x, y, rng, micro: int):
    from .classification import cross_entropy

    n = x.shape[0] // micro
    xs = _split_micro(x, n)
    ys = _split_micro(y, n)
    keys = jax.random.split(rng, n)

    def body(carry, xyk):
        gsum, lsum, bs = carry
        xm, ym, key = xyk

        def loss_fn(p):
            variables = {"params": p}
            mutable = False
            if bs is not None:
                variables["batch_stats"] = bs
                mutable = ["batch_stats"]
            rngs = {"dropout": key, "sample": key}
            if mutable:
                out, nv = state.apply_fn(variables, xm, train=True,
                                         rngs=rngs, mutable=mutable)
                nbs = nv.get("batch_stats")
            else:
                out = state.apply_fn(variables, xm, train=True, rngs=rngs)
                nbs = bs
            return cross_entropy(out, ym), (out, nbs)

        (loss, (out, nbs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return (_tree_add(gsum, grads), lsum + loss, nbs), out

    carry0 = (_tree_zeros(state.params), jnp.float32(0.0), state.batch_stats)
    (gsum, lsum, bs), outs = lax.scan(body, carry0, (xs, ys, keys))
    inv = jnp.float32(1.0 / n)
    grads = jax.tree.map(lambda g: g * inv, gsum)
    state = state.apply_gradients(grads, new_batch_stats=bs)
    outputs = outs.reshape(x.shape[0], *outs.shape[2:])
    return state, lsum * inv, jax.nn.softmax(outputs, axis=-1)


def class_train_step_accum(state: TrainState, x, y, rng, micro: int = 2):
    """`_class_step(train=True)` with scan gradient accumulation — reaches
    the reference's DilatedCNN batch 10 (`baseline_sample_classification
    .ipynb` cell 28) whose flat 180^3 graph the remote compiler rejects.
    Returns (state, mean_loss, softmax_probs) like `_class_step`."""
    if x.shape[0] % micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by micro={micro}")
    return _class_accum(state, x, y, rng, micro)
