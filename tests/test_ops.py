"""Op-level numerics vs PyTorch golden outputs (the reference's compute
substrate is cuDNN via torch — SURVEY.md §2.2)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.ops import functional as F


def to_jax(x_nchw):
    """torch N,C,spatial... -> channels-last jax array."""
    return jnp.asarray(np.moveaxis(x_nchw, 1, -1))


def to_np(y_ndhwc):
    return np.moveaxis(np.asarray(y_ndhwc), -1, 1)


def assert_close(a, b, tol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    assert err < tol, f"rel err {err}"


@pytest.fixture
def data(rng):
    x = rng.normal(size=(2, 3, 13, 14, 15)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    return x, w, b


@pytest.mark.parametrize("stride,padding,dilation", [
    (1, 1, 1), (2, 1, 1), (1, 3, 3), (2, 0, 3), ((1, 2, 1), (0, 1, 2), 1),
])
def test_conv3d_matches_torch(data, stride, padding, dilation):
    x, w, b = data
    yt = TF.conv3d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=stride, padding=padding, dilation=dilation).numpy()
    yj = F.conv3d(to_jax(x), jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                  jnp.asarray(b), stride=stride, padding=padding,
                  dilation=dilation)
    assert_close(to_np(yj), yt)


def test_separable_conv_matches_torch(rng):
    # fader-style (k,1,1)/(1,k,1)/(1,1,k) convs with per-axis stride
    x = rng.normal(size=(1, 1, 20, 20, 20)).astype(np.float32)
    w = rng.normal(size=(8, 1, 6, 1, 1)).astype(np.float32)
    yt = TF.conv3d(torch.tensor(x), torch.tensor(w), stride=(2, 1, 1),
                   padding=(2, 0, 0)).numpy()
    yj = F.conv3d(to_jax(x), jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                  stride=(2, 1, 1), padding=(2, 0, 0))
    assert_close(to_np(yj), yt)


@pytest.mark.parametrize("k,s,p,op", [(4, 4, 0, 0), (2, 2, 0, 0), (3, 2, 1, 1)])
def test_conv3d_transpose_matches_torch(rng, k, s, p, op):
    x = rng.normal(size=(1, 3, 5, 6, 7)).astype(np.float32)
    w = rng.normal(size=(3, 2, k, k, k)).astype(np.float32)  # torch (I,O,k..)
    b = rng.normal(size=(2,)).astype(np.float32)
    yt = TF.conv_transpose3d(torch.tensor(x), torch.tensor(w),
                             torch.tensor(b), stride=s, padding=p,
                             output_padding=op).numpy()
    yj = F.conv3d_transpose(to_jax(x), jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                            jnp.asarray(b), stride=s, padding=p,
                            output_padding=op)
    assert_close(to_np(yj), yt)


@pytest.mark.parametrize("k,s", [(2, 2), (4, 2), (3, 3)])
def test_maxpool3d_matches_torch(data, k, s):
    x = data[0]
    yt = TF.max_pool3d(torch.tensor(x), k, s).numpy()
    yj = F.maxpool3d(to_jax(x), k, s)
    assert_close(to_np(yj), yt, 1e-7)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("size", [(26, 28, 30), (7, 9, 8), (17, 19, 23)])
def test_resize_linear_matches_torch(data, align, size):
    x = data[0]
    yt = TF.interpolate(torch.tensor(x), size=size, mode="trilinear",
                        align_corners=align).numpy()
    yj = F.resize_linear(to_jax(x), size, align_corners=align)
    assert_close(to_np(yj), yt, 2e-5)


@pytest.mark.parametrize("size", [(26, 28, 30), (17, 19, 23), (52, 56, 60)])
def test_resize_nearest_matches_torch(data, size):
    x = data[0]
    yt = TF.interpolate(torch.tensor(x), size=size, mode="nearest").numpy()
    yj = F.resize_nearest(to_jax(x), size)
    assert_close(to_np(yj), yt, 1e-7)


def test_conv2d_matches_torch(rng):
    x = rng.normal(size=(2, 2, 16, 32)).astype(np.float32)
    w = rng.normal(size=(16, 2, 3, 3)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    yt = TF.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()
    yj = F.conv2d(to_jax(x), jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b))
    assert_close(to_np(yj), yt)


def test_norms_match_torch(rng):
    x = rng.normal(size=(2, 8, 5, 6, 7)).astype(np.float32)
    g = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    assert_close(
        to_np(F.instance_norm(to_jax(x))),
        TF.instance_norm(torch.tensor(x)).numpy(), 1e-4)
    assert_close(
        to_np(F.group_norm(to_jax(x), 4, jnp.asarray(g), jnp.asarray(b))),
        TF.group_norm(torch.tensor(x), 4, torch.tensor(g), torch.tensor(b)).numpy(),
        1e-4)
    mean = rng.normal(size=(8,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
    assert_close(
        to_np(F.batch_norm(to_jax(x), jnp.asarray(mean), jnp.asarray(var),
                           jnp.asarray(g), jnp.asarray(b))),
        TF.batch_norm(torch.tensor(x), torch.tensor(mean), torch.tensor(var),
                      torch.tensor(g), torch.tensor(b), training=False).numpy(),
        1e-4)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 0, 3)])
def test_conv3d_dw_fallback_path(rng, stride, padding, dilation, monkeypatch):
    """The huge-volume dw fallback (XLA's rule) must match the im2col path."""
    import jax

    from mri_epilepsy_diagnosis_tpu.ops import functional as OF

    x = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))

    def loss(w):
        return (F.conv3d(x, w, stride=stride, padding=padding,
                         dilation=dilation) ** 2).sum()

    dw_im2col = jax.grad(loss)(w)
    monkeypatch.setattr(OF, "_DW_PATCHES_BYTES_LIMIT", 0)
    dw_loop = jax.grad(loss)(w)
    # paths use different accumulation orders; agreement is to f32 roundoff
    np.testing.assert_allclose(np.asarray(dw_loop), np.asarray(dw_im2col),
                               rtol=1e-4, atol=1e-4)


def test_prelu_matches_torch(rng):
    x = rng.normal(size=(2, 4, 5, 6, 7)).astype(np.float32)
    a = np.array([0.17], np.float32)
    yt = TF.prelu(torch.tensor(x), torch.tensor(a)).numpy()
    yj = F.prelu(to_jax(x), jnp.asarray(a))
    assert_close(to_np(yj), yt, 1e-7)


def test_crop_or_pad_roundtrip(rng):
    x = rng.normal(size=(1, 10, 12, 14, 1)).astype(np.float32)
    y = F.crop_or_pad(jnp.asarray(x), (8, 16, 14))
    assert y.shape == (1, 8, 16, 14, 1)
    # crop is centered
    np.testing.assert_allclose(np.asarray(y)[0, :, 2:14, :, 0],
                               x[0, 1:9, :, :, 0])
