"""Flax linen building blocks with PyTorch-compatible semantics.

These are thin module wrappers over `ops.functional`; parameters are stored
in shapes that make the `.pth` importer a pure transpose
(see `interop/torch_import.py`):

- Conv3d / ConvTranspose3d weight: (kD, kH, kW, I, O)  [torch (O,I,kD,kH,kW)]
- Conv2d weight:                   (kH, kW, I, O)
- Linear weight:                   (in, out)            [torch (out, in)]
- BatchNorm: weight/bias params + running_mean/var in `batch_stats`
- PReLU: single shared weight (torch `num_parameters=1`)

Initializers replicate torch defaults (kaiming-uniform a=sqrt(5) for convs &
linear, U(±1/sqrt(fan_in)) bias) so train-from-scratch runs start from the
same distribution family as the reference.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import functional as F

Dtype = Any


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 3


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 2


def kaiming_uniform_torch(fan_in: int):
    """torch's default conv/linear weight init: kaiming_uniform(a=sqrt(5)).

    gain = sqrt(2/(1+5)) = 1/sqrt(3); bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in).
    """
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_bias_torch(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float):
    """torch nn.init.xavier_uniform_ with explicit gain, for DHWIO weights."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:      # (in, out) linear
            fan_in, fan_out = shape
        else:                    # (*k, I, O)
            rf = int(np.prod(shape[:-2]))
            fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv3d(nn.Module):
    """torch nn.Conv3d parity. Input (N,D,H,W,C)."""
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        fan_in = (self.in_channels // self.groups) * int(np.prod(k))
        w_init = self.weight_init or kaiming_uniform_torch(fan_in)
        w = self.param(
            "weight", w_init,
            (*k, self.in_channels // self.groups, self.out_channels))
        b = None
        if self.use_bias:
            b_init = self.bias_init or uniform_bias_torch(fan_in)
            b = self.param("bias", b_init, (self.out_channels,))
        return F.conv3d(x, w.astype(x.dtype), None if b is None else b,
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation, groups=self.groups)


class ConvTranspose3d(nn.Module):
    """torch nn.ConvTranspose3d parity. Weight stored (kD,kH,kW,O,I) so the
    importer applies the same (2,3,4,1,0) transpose as for Conv3d."""
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        # torch fan_in for transpose conv: out_channels/groups * prod(k)
        fan_in = self.out_channels * int(np.prod(k))
        w = self.param("weight", kaiming_uniform_torch(fan_in),
                       (*k, self.out_channels, self.in_channels))
        b = (self.param("bias", uniform_bias_torch(fan_in),
                        (self.out_channels,)) if self.use_bias else None)
        return F.conv3d_transpose(x, w.astype(x.dtype), b,
                                  stride=self.stride, padding=self.padding,
                                  output_padding=self.output_padding)


class Conv2d(nn.Module):
    """torch nn.Conv2d parity. Input (N,H,W,C)."""
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        fan_in = self.in_channels * int(np.prod(k))
        w = self.param("weight", kaiming_uniform_torch(fan_in),
                       (*k, self.in_channels, self.out_channels))
        b = (self.param("bias", uniform_bias_torch(fan_in),
                        (self.out_channels,)) if self.use_bias else None)
        return F.conv2d(x, w.astype(x.dtype), b,
                        stride=self.stride, padding=self.padding)


class Linear(nn.Module):
    """torch nn.Linear parity; weight stored (in, out)."""
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", kaiming_uniform_torch(self.in_features),
                       (self.in_features, self.out_features))
        b = (self.param("bias", uniform_bias_torch(self.in_features),
                        (self.out_features,)) if self.use_bias else None)
        return F.dense(x, w, b)


class BatchNorm(nn.Module):
    """torch nn.BatchNorm{1,2,3}d parity over channels-last inputs.

    momentum has torch meaning: running = (1-m)*running + m*batch.
    Running var update uses the unbiased batch variance (torch behavior).
    """
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        gamma = self.param("weight", nn.initializers.ones, (self.num_features,))
        beta = self.param("bias", nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((self.num_features,)))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((self.num_features,)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                n = float(np.prod([x.shape[a] for a in axes]))
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        return F.batch_norm(x, mean, var, gamma, beta, self.eps)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm3d(affine=False) parity."""
    num_features: int
    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x):
        gamma = beta = None
        if self.affine:
            gamma = self.param("weight", nn.initializers.ones, (self.num_features,))
            beta = self.param("bias", nn.initializers.zeros, (self.num_features,))
        return F.instance_norm(x, gamma, beta, self.eps)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm parity (affine=True default)."""
    num_groups: int
    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.num_features,))
        beta = self.param("bias", nn.initializers.zeros, (self.num_features,))
        return F.group_norm(x, self.num_groups, gamma, beta, self.eps)


class PReLU(nn.Module):
    """torch nn.PReLU(num_parameters=1, init=0.25) parity."""
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "weight",
            lambda key, shape: jnp.full(shape, self.init, dtype=jnp.float32),
            (1,))
        return F.prelu(x, a)


class Dropout(nn.Module):
    """torch nn.Dropout parity (inverted dropout)."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
