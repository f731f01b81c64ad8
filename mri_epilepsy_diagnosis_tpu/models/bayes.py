"""Bayesian (variational, local-reparameterization) conv layers.

Capability-parity with `segmentation/models/3d_bayes_layers.py` (reference
`BayesConv3d`/`BayesConv2d`/`_BayesConvNd`): learn mu/logsigma weights;
training samples `out = mu_out + eps * sigma_out` with
`sigma_out = sqrt(1e-4 + conv(x^2, mu^2 * exp(log_alpha)))`,
`log_alpha = clamp(logsigma - log(mu^2 + 1e-8), -5, 5)`; eval applies the
variational-dropout pruning mask `log_alpha < threshold`.

Also carries the reference file's auxiliary block family
(`3d_bayes_layers.py:257-368`): `ConvSample`, `Flatten`/`DeFlatten`,
`ConvLayer` (`Conv_Layer`), `ConvTransposeLayer` (`Conv_Transpose_Layer`),
`DownConv`/`InitConv`/`UpConv`/`FinalConv` — the conv+InstanceNorm+ReLU
VAE-style building blocks.

Sampling uses the linen rng stream "sample".
"""
from __future__ import annotations

import math
from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import functional as F
from ..ops.layers import Conv2d, Conv3d, ConvTranspose3d, InstanceNorm


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 3


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 2


class _BayesConvNd(nn.Module):
    """Shared mu/logsigma parameterization + local-reparameterization math
    (reference `_BayesConvNd`, `3d_bayes_layers.py:87-147`). Subclasses set
    `ndim` and the functional conv."""
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    zero_mean: bool = False
    threshold: float = 3.0

    ndim: int = 3

    def _conv(self, x, w, b):
        convfn = F.conv3d if self.ndim == 3 else F.conv2d
        return convfn(x, w, b, stride=self.stride, padding=self.padding,
                      dilation=self.dilation)

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _triple(self.kernel_size) if self.ndim == 3 else _pair(
            self.kernel_size)
        shape = (*k, self.in_channels, self.out_channels)
        mu_init = (nn.initializers.zeros if self.zero_mean
                   else nn.initializers.normal(stddev=0.02))
        mu_w = self.param("mu_weight", mu_init, shape)
        logsigma_w = self.param(
            "logsigma_weight", lambda key, s: jnp.full(s, -5.0), shape)
        mu_b = logsigma_b = None
        if self.use_bias:
            fan_in = self.in_channels * int(np.prod(k))
            bound = 1.0 / math.sqrt(fan_in)
            binit = lambda key, s: jax.random.uniform(key, s, jnp.float32,
                                                      -bound, bound)
            mu_b = self.param("mu_bias", binit, (self.out_channels,))
            logsigma_b = self.param("logsigma_bias", binit, (self.out_channels,))

        log_alpha = jnp.clip(
            logsigma_w - jnp.log(jnp.square(mu_w) + 1e-8), -5.0, 5.0)
        var_w = jnp.square(mu_w) * jnp.exp(log_alpha)
        var_b = None if logsigma_b is None else jnp.square(logsigma_b)

        if train:
            mu_out = self._conv(x, mu_w, mu_b)
            var_out = self._conv(jnp.square(x), var_w, var_b)
        else:
            mask = (log_alpha < self.threshold).astype(mu_w.dtype)
            mu_out = self._conv(x, mu_w * mask, mu_b)
            var_out = self._conv(jnp.square(x), var_w * mask, var_b)
        sigma_out = jnp.sqrt(1e-4 + var_out)
        eps = jax.random.normal(self.make_rng("sample"), sigma_out.shape,
                                sigma_out.dtype)
        return eps * sigma_out + mu_out


class BayesConv3d(_BayesConvNd):
    """Reference `BayesConv3d` (`3d_bayes_layers.py:194-232`)."""
    ndim: int = 3


class BayesConv2d(_BayesConvNd):
    """Reference `BayesConv2d` (`3d_bayes_layers.py:149-192`).
    Input (N, H, W, C)."""
    ndim: int = 2


class ConvSample(nn.Module):
    """Reference `ConvSample` (`3d_bayes_layers.py:259-271`): two plain 2D
    convs produce mu and logsigma(x) := conv(log(x^2+1e-8)); samples
    mu + eps * exp(0.5 * logsigma)."""
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]

    @nn.compact
    def __call__(self, x):
        mu = Conv2d(self.in_channels, self.out_channels, self.kernel_size,
                    name="conv_mu")(x)
        logsigma = Conv2d(self.in_channels, self.out_channels,
                          self.kernel_size, name="conv_sigma")(
            jnp.log(jnp.square(x) + 1e-8))
        std = jnp.exp(0.5 * logsigma)
        eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        return eps * std + mu


def flatten(x):
    """Reference `Flatten`: (N, ...) -> (N, prod)."""
    return x.reshape(x.shape[0], -1)


class DeFlatten(nn.Module):
    """Reference `DeFlatten`: (N, prod) -> (N, *shape).  `shape` is the
    channels-last (D, H, W, C) target (reference stores NCDHW (C,D,H,W))."""
    shape: Sequence[int]

    def __call__(self, x):
        return x.reshape(x.shape[0], *self.shape)


class ConvLayer(nn.Module):
    """Reference `Conv_Layer`: conv3x3 -> InstanceNorm -> ReLU."""
    in_channels: int
    out_channels: int
    stride: Union[int, Sequence[int]] = 1

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.in_channels, self.out_channels, 3, padding=1,
                   stride=self.stride, name="conv")(x)
        x = InstanceNorm(self.out_channels)(x)
        return jax.nn.relu(x)


class ConvTransposeLayer(nn.Module):
    """Reference `Conv_Transpose_Layer`: deconv -> InstanceNorm -> ReLU."""
    in_channels: int
    out_channels: int
    stride: Union[int, Sequence[int]] = 2
    kernel_size: Union[int, Sequence[int]] = (4, 4, 4)

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose3d(self.in_channels, self.out_channels,
                            self.kernel_size, stride=self.stride,
                            name="conv")(x)
        x = InstanceNorm(self.out_channels)(x)
        return jax.nn.relu(x)


class DownConv(nn.Module):
    """Reference `Down_Conv`: strided conv layer + conv layer."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = ConvLayer(self.in_channels, self.out_channels, 2, name="conv_1")(x)
        return ConvLayer(self.out_channels, self.out_channels, 1,
                         name="conv_2")(x)


class InitConv(nn.Module):
    """Reference `Init_Conv`: two stride-1 conv layers."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = ConvLayer(self.in_channels, self.out_channels, name="conv_1")(x)
        return ConvLayer(self.out_channels, self.out_channels,
                         name="conv_2")(x)


class UpConv(nn.Module):
    """Reference `Up_Conv`: deconv x1 up 2x, pad to match the skip, concat
    (skip first, torch dim=1 == channels), then a conv layer."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x1, x2):
        x1 = ConvTransposeLayer(self.in_channels, self.in_channels // 2,
                                name="deconv")(x1)
        # torch F.pad with negative amounts crops; the kernel-4/stride-2
        # deconv yields 2N+2, so the diffs here are typically negative.
        pads, slices = [(0, 0)], [slice(None)]
        for ax in range(1, 4):
            diff = x2.shape[ax] - x1.shape[ax]
            lo, hi = diff // 2, diff - diff // 2
            pads.append((max(lo, 0), max(hi, 0)))
            slices.append(slice(-min(lo, 0),
                                x1.shape[ax] + min(hi, 0)))
        pads.append((0, 0))
        slices.append(slice(None))
        x1 = jnp.pad(x1[tuple(slices)], pads)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvLayer(self.in_channels, self.out_channels, name="conv")(x)


class FinalConv(nn.Module):
    """Reference `Final_Conv`: 1x1x1 conv head."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return Conv3d(self.in_channels, self.out_channels, 1, name="conv")(x)
