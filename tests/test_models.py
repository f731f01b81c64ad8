"""Model zoo: shapes, param layouts, and torch golden checks where cheap."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.models import (BraTSUnet, CNN, ConvLSTM,
                                               DilatedCNN, Modified3DUNet,
                                               PatchModel, ResidualUNet3D,
                                               UNet3D, VoxResNet)
from mri_epilepsy_diagnosis_tpu.models.bayes import BayesConv3d
from mri_epilepsy_diagnosis_tpu.ops import functional as _F


@pytest.fixture(autouse=True, scope="module")
def _fast_precision():
    _F.set_precision_override("fast")
    yield
    _F.set_precision_override(None)


def test_voxresnet_shapes(rng):
    m = VoxResNet(input_shape=(16, 16, 16), n_filters=4, stride=1,
                  n_blocks=3, n_fc_units=8)
    v = m.init(jax.random.key(0), jnp.zeros((2, 16, 16, 16, 1)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)),
                                 jnp.float32))
    assert out.shape == (2, 2)
    # torch-style Sequential key layout for .pth import
    assert "model__conv3d_1" in v["params"]
    assert "conv1" in v["params"]["model__block_1"]


def test_cnn_and_convlstm(rng):
    m = CNN(input_shape=(16, 16, 16), n_filters=4, n_blocks=2, n_fc_units=8)
    v = m.init(jax.random.key(0), jnp.zeros((2, 16, 16, 16, 1)))
    out = m.apply(v, jnp.zeros((2, 16, 16, 16, 1)))
    assert out.shape == (2, 8)

    lstm = ConvLSTM(input_shape=(8, 8, 8), n_outputs=1, hidden_size=8,
                    n_layers=2, n_fc_units_rnn=8, n_filters=2, n_blocks=2,
                    n_fc_units_cnn=8)
    v = lstm.init(jax.random.key(0), jnp.zeros((2, 3, 8, 8, 8, 1)))
    out = lstm.apply(v, jnp.asarray(rng.normal(size=(2, 3, 8, 8, 8, 1)),
                                    jnp.float32))
    assert out.shape == (2, 1)
    assert "weight_ih_l0" in v["params"]["lstm"]


def test_lstm_matches_torch(rng):
    import torch

    from mri_epilepsy_diagnosis_tpu.interop import import_torch_state_dict
    from mri_epilepsy_diagnosis_tpu.models.cnn import LSTM

    tl = torch.nn.LSTM(6, 5, 2, batch_first=True)
    x = rng.normal(size=(3, 7, 6)).astype(np.float32)
    with torch.no_grad():
        golden, _ = tl(torch.tensor(x))

    m = LSTM(6, 5, 2)
    v = m.init(jax.random.key(0), jnp.zeros((1, 1, 6)))
    sd = {k: t.detach().numpy() for k, t in tl.state_dict().items()}
    v = import_torch_state_dict(v, sd)
    out = m.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), golden.numpy(), atol=2e-5)


def test_dilated_cnn_output_is_probability(rng):
    # smallest spatial size the reference's layer arithmetic supports
    m = DilatedCNN(input_shape=(161, 161, 161), n_channels=2)
    v = m.init(jax.random.key(0), jnp.zeros((1, 161, 161, 161, 1)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(1, 161, 161, 161, 1)),
                                 jnp.float32))
    assert out.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_patch_model(rng):
    m = PatchModel()
    v = m.init(jax.random.key(0), jnp.zeros((2, 16, 32, 2)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(2, 16, 32, 2)), jnp.float32))
    assert out.shape == (2, 2)


def test_modified_3dunet(rng):
    m = Modified3DUNet(in_channels=1, n_classes=2, base_n_filter=2)
    v = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)),
                                 jnp.float32))
    assert out.shape == (1, 16, 16, 16, 2)
    # shared norm_lrelu_conv modules: one param set per level
    assert "norm_lrelu_conv_c2" in v["params"]


def test_brats_unet(rng):
    m = BraTSUnet(c=1, n=4, num_classes=3)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)),
                                 jnp.float32))
    assert out.shape == (1, 32, 32, 32, 3)  # full-res head + upsampled ds


def test_residual_unet(rng):
    m = ResidualUNet3D(n_classes=2, n_channels=(1, 2, 4, 8, 16), shorten=True)
    v = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    out = m.apply(v, jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)),
                                 jnp.float32))
    assert out.shape == (1, 16, 16, 16, 2)


def test_bayes_conv(rng):
    m = BayesConv3d(2, 4, 3, padding=1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)), jnp.float32)
    v = m.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
    assert "mu_weight" in v["params"] and "logsigma_weight" in v["params"]
    # train mode samples -> two rngs give different outputs
    y1 = m.apply(v, x, True, rngs={"sample": jax.random.key(2)})
    y2 = m.apply(v, x, True, rngs={"sample": jax.random.key(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # eval mode with alpha below threshold ~ deterministic conv + small noise
    ye = m.apply(v, x, False, rngs={"sample": jax.random.key(4)})
    assert ye.shape == (1, 8, 8, 8, 4)


def test_unet_remat_identical(rng):
    """remat=True must not change params, outputs, or gradients — it only
    changes the autodiff schedule (jax.checkpoint on each block)."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)), jnp.float32)
    base = UNet3D(num_encoding_blocks=2, out_channels_first_layer=4)
    fast = UNet3D(num_encoding_blocks=2, out_channels_first_layer=4,
                  remat=True)
    v = base.init(jax.random.key(0), x)
    v2 = fast.init(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    np.testing.assert_array_equal(
        np.asarray(v["params"]["encoder"]["encoding_blocks__0"]["conv1"]
                   ["conv_layer"]["weight"]),
        np.asarray(v2["params"]["encoder"]["encoding_blocks__0"]["conv1"]
                   ["conv_layer"]["weight"]))
    np.testing.assert_allclose(np.asarray(base.apply(v, x)),
                               np.asarray(fast.apply(v, x)),
                               rtol=1e-6, atol=1e-6)

    if True:
        def loss(m, vv):
            return jnp.sum(jnp.square(m.apply(vv, x, train=True,
                                              mutable=["batch_stats"])[0]))
        g1 = jax.grad(lambda p: loss(base, {"params": p,
                                            "batch_stats": v["batch_stats"]}))(
            v["params"])
        g2 = jax.grad(lambda p: loss(fast, {"params": p,
                                            "batch_stats": v["batch_stats"]}))(
            v["params"])
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
