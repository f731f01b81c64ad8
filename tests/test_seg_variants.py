"""Segmentation train/eval steps across the model zoo variants that need
RNG streams (dropout, Bayesian sampling)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.models import Modified3DUNet, ResidualUNet3D
from mri_epilepsy_diagnosis_tpu.ops import functional as _F
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import seg_eval_step, seg_train_step
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state


@pytest.fixture(autouse=True, scope="module")
def _fast_precision():
    _F.set_precision_override("fast")
    yield
    _F.set_precision_override(None)


@pytest.mark.parametrize("make_model", [
    lambda: Modified3DUNet(in_channels=1, n_classes=2, base_n_filter=2),
    lambda: ResidualUNet3D(n_classes=2, n_channels=(1, 2, 4, 8, 16),
                           shorten=True, bayes=True),
])
def test_seg_steps_with_stochastic_models(rng, make_model):
    model = make_model()
    state = create_train_state(
        model, torch_adamw(1e-3), jnp.zeros((1, 16, 16, 16, 1)),
        variables=model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1),
             "dropout": jax.random.key(2)},
            jnp.zeros((1, 16, 16, 16, 1))))
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    y = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > 0.5), jnp.float32)
    state, loss = seg_train_step(state, x, y)
    assert np.isfinite(float(loss))
    eloss = seg_eval_step(state, x, y)
    assert np.isfinite(float(eloss))
