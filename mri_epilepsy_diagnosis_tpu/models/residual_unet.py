"""Residual 3D U-Net with optional Bayesian convs.

Capability-parity with `segmentation/models/3d_bayes_unet.py` +
`3d_bayes_layers.py` building blocks (reference `UNet3D`): pre-activation
ConvBlocks (InstanceNorm -> ReLU -> conv, bias-free), residual down blocks
with 1x1 strided projection, up blocks that upsample trilinearly with
align_corners=True and *add* (not concat) the skip, and a 1x1 output conv.

The reference's only multi-device strategy — encoder on devices[0], decoder
on devices[1] with an explicit activation transfer (`3d_bayes_unet.py:45-66`)
— is deliberately dropped: on TPU the model is sharded with
`jax.sharding`/pjit instead (see `parallel/`), which subsumes the manual
2-stage split.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import functional as F
from ..ops.layers import Conv3d
from .bayes import BayesConv3d


def _relu(x):
    return jnp.maximum(x, 0)


class ConvBlock(nn.Module):
    """(InstanceNorm => ReLU => conv), conv at Sequential index 2."""
    in_channels: int
    out_channels: int
    kernel: int
    stride: int = 1
    padding: int = 1
    bayes: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _relu(F.instance_norm(x))
        if self.bayes:
            return BayesConv3d(self.in_channels, self.out_channels,
                               self.kernel, stride=self.stride,
                               padding=self.padding, use_bias=False,
                               name="conv__2")(x, train)
        return Conv3d(self.in_channels, self.out_channels, self.kernel,
                      stride=self.stride, padding=self.padding,
                      use_bias=False, name="conv__2")(x)


class BasicDownBlock(nn.Module):
    in_channels: int
    out_channels: int
    downsample: bool
    bayes: bool = False

    @nn.compact
    def __call__(self, inp, train: bool = False):
        s = 2 if self.downsample else 1
        x = ConvBlock(self.in_channels, self.out_channels, 3, stride=s,
                      bayes=self.bayes, name="conv_1")(inp, train)
        x = ConvBlock(self.out_channels, self.out_channels, 3,
                      bayes=self.bayes, name="conv_2")(x, train)
        if self.downsample:
            proj = ConvBlock(self.in_channels, self.out_channels, 1, stride=2,
                             padding=0, name="down")(inp, train)
            return x + proj
        return x + inp


class BasicUpBlock(nn.Module):
    in_channels: int
    out_channels: int
    bayes: bool = False

    @nn.compact
    def __call__(self, inp, skip=None, train: bool = False):
        x = ConvBlock(self.in_channels, self.out_channels, 1, stride=1,
                      padding=0, name="upsample__0")(inp, train)
        x = F.resize_linear(x, tuple(2 * s for s in x.shape[1:4]),
                            align_corners=True)
        if skip is not None:
            x = x + skip
        x1 = ConvBlock(self.out_channels, self.out_channels, 3,
                       bayes=self.bayes, name="conv_1")(x, train)
        x1 = ConvBlock(self.out_channels, self.out_channels, 3,
                       bayes=self.bayes, name="conv_2")(x1, train)
        return x1 + x


class ResidualUNet3D(nn.Module):
    n_classes: int = 2
    n_channels: Sequence[int] = (1, 16, 32, 64, 128)
    bayes: bool = False
    shorten: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        nc = self.n_channels
        if self.bayes:
            x1 = BayesConv3d(nc[0], nc[1], 3, padding=1, use_bias=False,
                             name="init_conv")(x, train)
        else:
            x1 = Conv3d(nc[0], nc[1], 3, padding=1, use_bias=False,
                        name="init_conv")(x)

        x2 = BasicDownBlock(nc[1], nc[2], True, self.bayes, name="down1")(x1, train)
        x2 = BasicDownBlock(nc[2], nc[2], False, self.bayes, name="down2")(x2, train)
        x3 = BasicDownBlock(nc[2], nc[3], True, self.bayes, name="down3")(x2, train)
        x3 = BasicDownBlock(nc[3], nc[3], False, self.bayes, name="down4")(x3, train)
        x4 = BasicDownBlock(nc[3], nc[4], True, self.bayes, name="down5")(x3, train)
        x4 = BasicDownBlock(nc[4], nc[4], False, self.bayes, name="down6")(x4, train)
        if not self.shorten:
            x4 = BasicDownBlock(nc[4], nc[4], False, self.bayes, name="down7")(x4, train)
            x4 = BasicDownBlock(nc[4], nc[4], False, self.bayes, name="down8")(x4, train)
            x4 = BasicDownBlock(nc[4], nc[4], False, self.bayes, name="down9")(x4, train)

        y = BasicUpBlock(nc[4], nc[3], self.bayes, name="up1")(x4, x3, train)
        y = BasicUpBlock(nc[3], nc[2], self.bayes, name="up2")(y, x2, train)
        y = BasicUpBlock(nc[2], nc[1], self.bayes, name="up3")(y, x1, train)
        return Conv3d(nc[1], self.n_classes, 1, use_bias=False, name="out")(y)
