"""BraTS2017-style 3D U-Net with GroupNorm and deep supervision.

Capability-parity with `segmentation/models/unet3d.py` (reference), which
adapts github.com/MIC-DKFZ/BraTS2017.  The reference's
`self.upsample = F.interpolate(scale_factor=2, ...)` at `unet3d.py:85` is a
latent construction-time bug (interpolate called with no input); here the
deep-supervision upsample is a working trilinear align_corners=False resize,
preserving the intended behavior (SURVEY.md §7, deliberately fixed).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import functional as F
from ..ops.layers import BatchNorm, Conv3d, Dropout, GroupNorm, InstanceNorm


class _Norm(nn.Module):
    planes: int
    norm: str = "gn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm == "bn":
            return BatchNorm(self.planes)(x, not train)
        if self.norm == "gn":
            return GroupNorm(4, self.planes)(x)
        if self.norm == "in":
            return InstanceNorm(self.planes)(x)
        raise ValueError(f"normalization type {self.norm} is not supported")


class ConvD(nn.Module):
    inplanes: int
    planes: int
    dropout: float = 0.0
    norm: str = "gn"
    first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.first:
            x = F.maxpool3d(x, 2, 2)
        x = _Norm(self.planes, self.norm, name="bn1")(
            Conv3d(self.inplanes, self.planes, 3, padding=1, use_bias=False,
                   name="conv1")(x), train)
        y = jnp.maximum(_Norm(self.planes, self.norm, name="bn2")(
            Conv3d(self.planes, self.planes, 3, padding=1, use_bias=False,
                   name="conv2")(x), train), 0)
        if self.dropout > 0:
            y = Dropout(self.dropout)(y, deterministic=not train)
        # NB: reference overwrites y with bn3(conv3(x)) (unet3d.py:46) —
        # conv2's output feeds only the dropout path; preserved as-is.
        y = _Norm(self.planes, self.norm, name="bn3")(
            Conv3d(self.planes, self.planes, 3, padding=1, use_bias=False,
                   name="conv3")(x), train)
        return jnp.maximum(x + y, 0)


class ConvU(nn.Module):
    planes: int
    norm: str = "gn"
    first: bool = False

    @nn.compact
    def __call__(self, x, prev, train: bool = False):
        if not self.first:
            x = jnp.maximum(_Norm(self.planes, self.norm, name="bn1")(
                Conv3d(2 * self.planes, self.planes, 3, padding=1,
                       use_bias=False, name="conv1")(x), train), 0)
        y = F.resize_linear(x, tuple(2 * s for s in x.shape[1:4]),
                            align_corners=False)
        y = jnp.maximum(_Norm(self.planes // 2, self.norm, name="bn2")(
            Conv3d(self.planes, self.planes // 2, 1, use_bias=False,
                   name="conv2")(y), train), 0)
        y = jnp.concatenate([prev, y], axis=-1)
        y = jnp.maximum(_Norm(self.planes, self.norm, name="bn3")(
            Conv3d(self.planes, self.planes, 3, padding=1, use_bias=False,
                   name="conv3")(y), train), 0)
        return y


class BraTSUnet(nn.Module):
    c: int = 4
    n: int = 16
    dropout: float = 0.5
    norm: str = "gn"
    num_classes: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.n
        up = lambda y: F.resize_linear(y, tuple(2 * s for s in y.shape[1:4]),
                                       align_corners=False)
        x1 = ConvD(self.c, n, self.dropout, self.norm, first=True,
                   name="convd1")(x, train)
        x2 = ConvD(n, 2 * n, self.dropout, self.norm, name="convd2")(x1, train)
        x3 = ConvD(2 * n, 4 * n, self.dropout, self.norm, name="convd3")(x2, train)
        x4 = ConvD(4 * n, 8 * n, self.dropout, self.norm, name="convd4")(x3, train)
        x5 = ConvD(8 * n, 16 * n, self.dropout, self.norm, name="convd5")(x4, train)

        y4 = ConvU(16 * n, self.norm, True, name="convu4")(x5, x4, train)
        y3 = ConvU(8 * n, self.norm, name="convu3")(y4, x3, train)
        y2 = ConvU(4 * n, self.norm, name="convu2")(y3, x2, train)
        y1 = ConvU(2 * n, self.norm, name="convu1")(y2, x1, train)

        s3 = Conv3d(8 * n, self.num_classes, 1, name="seg3")(y3)
        s2 = Conv3d(4 * n, self.num_classes, 1, name="seg2")(y2) + up(s3)
        s1 = Conv3d(2 * n, self.num_classes, 1, name="seg1")(y1) + up(s2)
        return s1
