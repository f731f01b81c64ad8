"""Bayesian layer family — capability parity with the reference's
`segmentation/models/3d_bayes_layers.py` (BayesConv2d/3d local
reparameterization, ConvSample, and the Conv_Layer/Up_Conv VAE blocks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.models import (
    BayesConv2d, BayesConv3d, ConvSample, DeFlatten, flatten,
    ConvLayer, ConvTransposeLayer, DownConv, InitConv, UpConv, FinalConv,
)
from mri_epilepsy_diagnosis_tpu.ops import functional as F


def test_bayes_conv2d_moments(rng):
    """Training-mode outputs are distributed N(mu_out, sigma_out^2) with
    mu_out = conv(x, mu_w) + mu_b and
    sigma_out^2 = 1e-4 + conv(x^2, mu_w^2 exp(log_alpha)) + logsigma_b^2
    (the reference's local-reparameterization forward,
    3d_bayes_layers.py:166-192)."""
    m = BayesConv2d(3, 8, 3, padding=1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    v = m.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)

    p = v["params"]
    mu_out = F.conv2d(x, p["mu_weight"], p["mu_bias"], padding=1)
    log_alpha = jnp.clip(p["logsigma_weight"]
                         - jnp.log(jnp.square(p["mu_weight"]) + 1e-8),
                         -5.0, 5.0)
    var_w = jnp.square(p["mu_weight"]) * jnp.exp(log_alpha)
    var_out = F.conv2d(jnp.square(x), var_w, jnp.square(p["logsigma_bias"]),
                       padding=1)
    sigma_out = np.asarray(jnp.sqrt(1e-4 + var_out))

    samples = np.stack([
        np.asarray(m.apply(v, x, True, rngs={"sample": jax.random.key(i)}))
        for i in range(300)
    ])
    np.testing.assert_allclose(samples.mean(0), np.asarray(mu_out),
                               atol=4 * sigma_out.max() / np.sqrt(300))
    np.testing.assert_allclose(samples.std(0), sigma_out,
                               rtol=0.35, atol=1e-3)


def test_bayes_conv2d_eval_pruning(rng):
    """Eval mode masks weights with log_alpha >= threshold (variational
    dropout pruning): with a low threshold every weight is pruned and the
    output collapses to bias + ~1e-2 noise."""
    m = BayesConv2d(2, 4, 3, padding=1, threshold=-10.0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    v = m.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
    y = m.apply(v, x, False, rngs={"sample": jax.random.key(2)})
    bias = np.asarray(v["params"]["mu_bias"])
    sigma_floor = np.sqrt(
        1e-4 + np.square(np.asarray(v["params"]["logsigma_bias"])))
    np.testing.assert_allclose(np.asarray(y),
                               np.broadcast_to(bias, y.shape),
                               atol=float(5 * sigma_floor.max()))


def test_bayes_conv3d_2d_consistency(rng):
    """BayesConv2d on (N,H,W,C) equals BayesConv3d with a size-1 depth axis
    when fed the same weights (shared _BayesConvNd math)."""
    m2 = BayesConv2d(2, 3, 3, padding=1, use_bias=False)
    m3 = BayesConv3d(2, 3, (1, 3, 3), padding=(0, 1, 1), use_bias=False)
    x2 = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    v2 = m2.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x2)
    v3 = jax.tree.map(lambda a: a.reshape((1,) + a.shape) if a.ndim == 4
                      else a, v2)
    y2 = m2.apply(v2, x2, True, rngs={"sample": jax.random.key(7)})
    y3 = m3.apply(v3, x2[:, None], True, rngs={"sample": jax.random.key(7)})
    np.testing.assert_allclose(np.asarray(y3[:, 0]), np.asarray(y2),
                               rtol=2e-4, atol=2e-4)


def test_conv_sample_and_deflatten(rng):
    m = ConvSample(4, 6, 3)
    x = jnp.asarray(np.abs(rng.normal(size=(2, 10, 10, 4))) + 0.1, jnp.float32)
    v = m.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
    y = m.apply(v, x, rngs={"sample": jax.random.key(2)})
    assert y.shape == (2, 8, 8, 6)

    flat = flatten(y)
    assert flat.shape == (2, 8 * 8 * 6)
    back = DeFlatten((8, 8, 6)).apply({}, flat)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(y))


def test_vae_block_assembly(rng):
    """Init_Conv -> Down_Conv -> Up_Conv -> Final_Conv wiring (the reference
    file's VAE-style blocks, 3d_bayes_layers.py:283-368), including Up_Conv's
    crop-to-skip behavior for the kernel-4/stride-2 deconv (torch F.pad with
    negative amounts)."""

    import flax.linen as nn

    class TinyVAE(nn.Module):
        @nn.compact
        def __call__(self, x):
            x1 = InitConv(1, 4)(x)            # (16) -> 16^3 x4
            x2 = DownConv(4, 8)(x1)           # -> 8^3 x8
            y = UpConv(8, 4)(x2, x1)          # deconv-> 18^3, crop to 16^3
            return FinalConv(4, 2)(y)

    m = TinyVAE()
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 16, 16, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_conv_transpose_layer_shape(rng):
    m = ConvTransposeLayer(4, 2)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 5, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    # torch ConvTranspose3d(k=4, s=2, p=0): (N-1)*2 + 4 = 2N + 2
    assert y.shape == (1, 12, 12, 12, 2)
    assert (np.asarray(y) >= 0).all()  # ReLU output
