"""Bayesian (variational, local-reparameterization) conv layers.

Capability-parity with `segmentation/models/3d_bayes_layers.py` (reference
`BayesConv3d`/`BayesConv2d`/`_BayesConvNd`): learn mu/logsigma weights;
training samples `out = mu_out + eps * sigma_out` with
`sigma_out = sqrt(1e-4 + conv(x^2, mu^2 * exp(log_alpha)))`,
`log_alpha = clamp(logsigma - log(mu^2 + 1e-8), -5, 5)`; eval applies the
variational-dropout pruning mask `log_alpha < threshold`.

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


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 3


class BayesConv3d(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    zero_mean: bool = False
    threshold: float = 3.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _triple(self.kernel_size)
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
            mu_out = F.conv3d(x, mu_w, mu_b, stride=self.stride,
                              padding=self.padding, dilation=self.dilation)
            var_out = F.conv3d(jnp.square(x), var_w, var_b,
                               stride=self.stride, padding=self.padding,
                               dilation=self.dilation)
        else:
            mask = (log_alpha < self.threshold).astype(mu_w.dtype)
            mu_out = F.conv3d(x, mu_w * mask, mu_b, stride=self.stride,
                              padding=self.padding, dilation=self.dilation)
            var_out = F.conv3d(jnp.square(x), var_w * mask, var_b,
                               stride=self.stride, padding=self.padding,
                               dilation=self.dilation)
        sigma_out = jnp.sqrt(1e-4 + var_out)
        eps = jax.random.normal(self.make_rng("sample"), sigma_out.shape,
                                sigma_out.dtype)
        return eps * sigma_out + mu_out
