"""2D patch detection CNN.

Capability-parity with `detection/model_utils.py:19-52` (reference
`PatchModel` / `ConvolutionBlock`): 5 valid conv3-BN-ReLU blocks
(2->16->32->64->128->256 channels) on 2-channel mirrored-hemisphere
16x32 patches, maxpool 2, dropout 0.4, FC(3*11*256 -> 256 -> 2).
Input here is channels-last (N, 16, 32, 2).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import functional as F
from ..ops.layers import BatchNorm, Conv2d, Dropout, Linear


class ConvolutionBlock(nn.Module):
    in_c: int
    out_c: int
    pad: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.in_c, self.out_c, 3, padding=self.pad, name="conv")(x)
        x = BatchNorm(self.out_c, name="bn")(x, not train)
        return jnp.maximum(x, 0)


class PatchModel(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (ci, co) in enumerate([(2, 16), (16, 32), (32, 64),
                                      (64, 128), (128, 256)]):
            x = ConvolutionBlock(ci, co, name=f"conv_blocks__{i}")(x, train)
        x = F.maxpool2d(x, 2)
        # torch flatten order: (N, C, H, W) C-major
        n = x.shape[0]
        x = jnp.moveaxis(x, -1, 1).reshape(n, -1)
        x = Dropout(0.4, name="dropout")(x, deterministic=not train)
        x = jnp.maximum(Linear(3 * 11 * 256, 256, name="fc1")(x), 0)
        x = Linear(256, 2, name="fc2")(x)
        return x
