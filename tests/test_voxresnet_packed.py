"""Packed-layout VoxResNet parity vs the fine path.

The packed trunk must reproduce `models.cnn.VoxResNet` exactly: eval
forward, train forward + BatchNorm batch statistics, and parameter
gradients (conv biases immediately followed by train-mode BN have
mathematically zero gradient — compared by absolute scale, not ratio).
Reference: classification/models/cnn_model.py:43-101.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.models import VoxResNet
from mri_epilepsy_diagnosis_tpu.models.voxresnet_packed import (
    voxresnet_apply_packed, voxresnet_class_step_packed)
from mri_epilepsy_diagnosis_tpu.train.classification import cross_entropy


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _make(S, n_blocks, stride=2, nf=4, dropout=0.0):
    model = VoxResNet(input_shape=(S,) * 3, n_filters=nf, stride=stride,
                      n_blocks=n_blocks, dropout=dropout, n_fc_units=16)
    v = model.init(jax.random.key(0), jnp.zeros((1, S, S, S, 1)))
    return model, v


def test_eval_parity_nb3(rng):
    S = 32
    model, v = _make(S, 3)
    x = jnp.asarray(rng.normal(size=(2, S, S, S, 1)).astype(np.float32))
    ref = model.apply(v, x, train=False)
    got, ns = voxresnet_apply_packed(model, v, x, train=False)
    assert ns is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_eval_parity_nb4_and_stride1(rng):
    # n_blocks=4 exercises the no-activation-after-fc1 quirk and the
    # deepest downsample chain; stride=1 exercises the k=4 stem fusion
    S = 64
    model, v = _make(S, 4, nf=2, dropout=0.5)
    x = jnp.asarray(rng.normal(size=(1, S, S, S, 1)).astype(np.float32))
    ref = model.apply(v, x, train=False)
    got, _ = voxresnet_apply_packed(model, v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)

    S = 16
    m1, v1 = _make(S, 3, stride=1)
    x1 = jnp.asarray(rng.normal(size=(2, S, S, S, 1)).astype(np.float32))
    ref1 = m1.apply(v1, x1, train=False)
    got1, _ = voxresnet_apply_packed(m1, v1, x1, train=False)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               atol=1e-5, rtol=1e-4)


def test_train_forward_stats_and_grad_parity(rng):
    S = 32
    model, v = _make(S, 3)
    x = jnp.asarray(rng.normal(size=(2, S, S, S, 1)).astype(np.float32))
    y = jnp.asarray([0, 1], jnp.int32)

    ref, nv = model.apply(v, x, train=True,
                          rngs={"dropout": jax.random.key(1)},
                          mutable=["batch_stats"])
    got, bs = voxresnet_apply_packed(model, v, x, train=True,
                                     rng=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # BatchNorm batch statistics must be fine-exact (same tree structure)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        nv["batch_stats"], bs)

    def loss_fine(p):
        out, _ = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True,
                             rngs={"dropout": jax.random.key(1)},
                             mutable=["batch_stats"])
        return cross_entropy(out, y)

    def loss_packed(p):
        out, _ = voxresnet_apply_packed(
            model, {"params": p, "batch_stats": v["batch_stats"]}, x,
            train=True, rng=jax.random.key(1))
        return cross_entropy(out, y)

    g1 = jax.grad(loss_fine)(v["params"])
    g2 = jax.grad(loss_packed)(v["params"])
    scale = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(g1))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4 * scale), g1, g2)


def test_packed_class_step_trains(rng):
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    S = 32
    model, _ = _make(S, 3, dropout=0.5)
    st = create_train_state(model, torch_adam(1e-3),
                            jnp.zeros((1, S, S, S, 1)))
    x = jnp.asarray(rng.normal(size=(2, S, S, S, 1)).astype(np.float32))
    y = jnp.asarray([0, 1], jnp.int32)
    p0 = jax.tree.map(lambda a: np.asarray(a), st.params)
    st, loss, probs = voxresnet_class_step_packed(st, x, y,
                                                  jax.random.key(2),
                                                  model=model)
    assert np.isfinite(float(loss))
    assert probs.shape == (2, 2)
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(st.params)))
    assert moved
    assert int(st.step) == 1
