"""Modified 3D U-Net (context/localization pathways, deep supervision).

Capability-parity with `segmentation/models/modified_3dunet.py` (reference):
InstanceNorm + LeakyReLU, nearest upsampling, residual context blocks with
*shared* norm_lrelu_conv modules applied twice per level (weight sharing is
preserved — linen reuses parameters when the same module instance is called
twice), and summed deep-supervision heads ds2/ds3.

InstanceNorm3d in the reference is affine=False (parameterless), so it is
purely functional here; conv submodule names match the reference's Sequential
indices for `.pth` import (`norm_lrelu_conv_c2.2.weight`, ...).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import functional as F
from ..ops.layers import Conv3d, Dropout


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _inorm(x):
    return F.instance_norm(x)


class _ConvNormLrelu(nn.Module):
    """Sequential(conv, InstanceNorm, LeakyReLU) — conv at index 0."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.cin, self.cout, 3, padding=1, use_bias=False, name="0")(x)
        return _lrelu(_inorm(x))


class _NormLreluConv(nn.Module):
    """Sequential(InstanceNorm, LeakyReLU, conv) — conv at index 2."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        x = _lrelu(_inorm(x))
        return Conv3d(self.cin, self.cout, 3, padding=1, use_bias=False, name="2")(x)


class _LreluConv(nn.Module):
    """Sequential(LeakyReLU, conv) — conv at index 1."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        return Conv3d(self.cin, self.cout, 3, padding=1, use_bias=False,
                      name="1")(_lrelu(x))


class _NormLreluUpscaleConvNormLrelu(nn.Module):
    """Sequential(IN, LReLU, Upsample(nearest x2), conv, IN, LReLU) — conv idx 3."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        x = _lrelu(_inorm(x))
        x = F.resize_nearest(x, tuple(2 * s for s in x.shape[1:4]))
        x = Conv3d(self.cin, self.cout, 3, padding=1, use_bias=False, name="3")(x)
        return _lrelu(_inorm(x))


class Modified3DUNet(nn.Module):
    in_channels: int = 1
    n_classes: int = 2
    base_n_filter: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_n_filter
        drop = Dropout(0.6, name="dropout3d")
        up_nearest = lambda y: F.resize_nearest(y, tuple(2 * s for s in y.shape[1:4]))

        # ---- Level 1 context pathway
        out = Conv3d(self.in_channels, b, 3, padding=1, use_bias=False,
                     name="conv3d_c1_1")(x)
        residual_1 = out
        out = _lrelu(out)
        out = Conv3d(b, b, 3, padding=1, use_bias=False, name="conv3d_c1_2")(out)
        out = drop(out, deterministic=not train)
        out = _LreluConv(b, b, name="lrelu_conv_c1")(out)
        out = out + residual_1
        context_1 = _lrelu(out)          # skip is taken *before* the norm
        out = _lrelu(_inorm(out))

        # ---- Levels 2-4 context pathway (shared norm_lrelu_conv per level)
        contexts = []
        chans = [(b, 2 * b, "c2"), (2 * b, 4 * b, "c3"), (4 * b, 8 * b, "c4")]
        for cin, cout, tag in chans:
            out = Conv3d(cin, cout, 3, stride=2, padding=1, use_bias=False,
                         name=f"conv3d_{tag}")(out)
            residual = out
            nlc = _NormLreluConv(cout, cout, name=f"norm_lrelu_conv_{tag}")
            out = nlc(out)
            out = drop(out, deterministic=not train)
            out = nlc(out)               # same module applied twice (shared)
            out = out + residual
            out = _lrelu(_inorm(out))
            contexts.append(out)
        context_2, context_3, context_4 = contexts

        # ---- Level 5 / localization level 0
        out = Conv3d(8 * b, 16 * b, 3, stride=2, padding=1, use_bias=False,
                     name="conv3d_c5")(out)
        residual_5 = out
        nlc5 = _NormLreluConv(16 * b, 16 * b, name="norm_lrelu_conv_c5")
        out = nlc5(out)
        out = drop(out, deterministic=not train)
        out = nlc5(out)
        out = out + residual_5
        out = _NormLreluUpscaleConvNormLrelu(
            16 * b, 8 * b, name="norm_lrelu_upscale_conv_norm_lrelu_l0")(out)
        out = Conv3d(8 * b, 8 * b, 1, use_bias=False, name="conv3d_l0")(out)
        out = _lrelu(_inorm(out))

        # ---- Level 1 localization
        out = jnp.concatenate([out, context_4], axis=-1)
        out = _ConvNormLrelu(16 * b, 16 * b, name="conv_norm_lrelu_l1")(out)
        out = Conv3d(16 * b, 8 * b, 1, use_bias=False, name="conv3d_l1")(out)
        out = _NormLreluUpscaleConvNormLrelu(
            8 * b, 4 * b, name="norm_lrelu_upscale_conv_norm_lrelu_l1")(out)

        # ---- Level 2 localization
        out = jnp.concatenate([out, context_3], axis=-1)
        out = _ConvNormLrelu(8 * b, 8 * b, name="conv_norm_lrelu_l2")(out)
        ds2 = out
        out = Conv3d(8 * b, 4 * b, 1, use_bias=False, name="conv3d_l2")(out)
        out = _NormLreluUpscaleConvNormLrelu(
            4 * b, 2 * b, name="norm_lrelu_upscale_conv_norm_lrelu_l2")(out)

        # ---- Level 3 localization
        out = jnp.concatenate([out, context_2], axis=-1)
        out = _ConvNormLrelu(4 * b, 4 * b, name="conv_norm_lrelu_l3")(out)
        ds3 = out
        out = Conv3d(4 * b, 2 * b, 1, use_bias=False, name="conv3d_l3")(out)
        out = _NormLreluUpscaleConvNormLrelu(
            2 * b, b, name="norm_lrelu_upscale_conv_norm_lrelu_l3")(out)

        # ---- Level 4 localization + deep supervision
        out = jnp.concatenate([out, context_1], axis=-1)
        out = _ConvNormLrelu(2 * b, 2 * b, name="conv_norm_lrelu_l4")(out)
        out_pred = Conv3d(2 * b, self.n_classes, 1, use_bias=False,
                          name="conv3d_l4")(out)

        ds2_conv = Conv3d(8 * b, self.n_classes, 1, use_bias=False,
                          name="ds2_1x1_conv3d")(ds2)
        ds3_conv = Conv3d(4 * b, self.n_classes, 1, use_bias=False,
                          name="ds3_1x1_conv3d")(ds3)
        ds_sum = up_nearest(ds2_conv) + ds3_conv
        return out_pred + up_nearest(ds_sum)
