"""3D U-Net segmenter — checkpoint-parity with the reference's external
fepegar `unet.UNet` (instantiated at `segmentation/routine.py:346-356`:
in_channels=1, out_classes=2, dimensions=3, num_encoding_blocks=3,
out_channels_first_layer=16 or 8, normalization='batch',
upsampling_type='linear', padding=True, activation='PReLU').

The architecture below is reconstructed from the shipped checkpoints
(`segmentation/weights/whole_im_train_seg_parc_epoch_7.pth`, 493,866 params,
154 tensors):

encoder.encoding_blocks.0.conv1:  Cin -> ocfl          (NO norm, PReLU)
encoder.encoding_blocks.0.conv2:  ocfl -> 2*ocfl       (BN, PReLU)   -> skip0
  maxpool 2
encoder.encoding_blocks.1.conv1:  2*ocfl -> 2*ocfl     (BN, PReLU)
encoder.encoding_blocks.1.conv2:  2*ocfl -> 4*ocfl     (BN, PReLU)   -> skip1
  maxpool 2
bottom_block.conv1:               4*ocfl -> 4*ocfl     (BN, PReLU)
bottom_block.conv2:               4*ocfl -> 8*ocfl     (BN, PReLU)
decoder.decoding_blocks.0:  trilinear x2, cat(skip1, up) -> conv1 -> conv2
decoder.decoding_blocks.1:  trilinear x2, cat(skip0, up) -> conv1 -> conv2
classifier:                 1x1x1 conv  2*ocfl//2... -> out_classes

All convs k=3, padding=1 (padding=True).  Upsampling is trilinear with
align_corners=False (torch nn.Upsample default).  Layout is channels-last
(N,D,H,W,C) — the importer transposes the torch weights once.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import functional as F
from ..ops.layers import BatchNorm, Conv3d, PReLU


class ConvBlock(nn.Module):
    """conv3 + optional BatchNorm + PReLU, named to mirror the checkpoint
    (`conv_layer` / `norm_layer` / `activation_layer`)."""
    in_channels: int
    out_channels: int
    normalization: bool = True
    kernel_size: int = 3
    padding: int = 1
    activation: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3d(self.in_channels, self.out_channels, self.kernel_size,
                   padding=self.padding, name="conv_layer")(x)
        if self.normalization:
            x = BatchNorm(self.out_channels, name="norm_layer")(
                x, use_running_average=not train)
        if self.activation:
            x = PReLU(name="activation_layer")(x)
        return x


class EncodingBlock(nn.Module):
    in1: int
    out1: int
    out2: int
    first: bool = False  # first block's conv1 has no normalization

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.in1, self.out1,
                      normalization=not self.first, name="conv1")(x, train)
        x = ConvBlock(self.out1, self.out2, name="conv2")(x, train)
        return x


class DecodingBlock(nn.Module):
    in_channels: int  # skip + upsampled
    out_channels: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        up = F.resize_linear(
            x, tuple(2 * s for s in x.shape[1:-1]), align_corners=False)
        # fepegar decoding: torch.cat((skip_connection, x), dim=CHANNELS)
        x = jnp.concatenate([skip, up], axis=-1)
        x = ConvBlock(self.in_channels, self.out_channels, name="conv1")(x, train)
        x = ConvBlock(self.out_channels, self.out_channels, name="conv2")(x, train)
        return x


class _Encoder(nn.Module):
    in_channels: int
    ocfl: int
    num_blocks: int
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        c_in = self.in_channels
        c1 = self.ocfl
        block_cls = (nn.remat(EncodingBlock, static_argnums=(2,))
                     if self.remat else EncodingBlock)
        for i in range(self.num_blocks - 1):
            if i == 0:
                blk = block_cls(c_in, c1, 2 * c1, first=True,
                                name=f"encoding_blocks__{i}")
            else:
                blk = block_cls(c_in, c_in, 2 * c_in,
                                name=f"encoding_blocks__{i}")
            x = blk(x, train)
            skips.append(x)
            x = F.maxpool3d(x, 2)
            c_in = x.shape[-1]
        return x, skips


class _Decoder(nn.Module):
    channels: Sequence[tuple]  # [(in_cat, out), ...]
    remat: bool = False

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        block_cls = (nn.remat(DecodingBlock, static_argnums=(3,))
                     if self.remat else DecodingBlock)
        for i, (cin, cout) in enumerate(self.channels):
            x = block_cls(cin, cout, name=f"decoding_blocks__{i}")(
                x, skips[-(i + 1)], train)
        return x


class UNet3D(nn.Module):
    """Parity UNet. Returns logits (N,D,H,W,out_classes).

    `remat=True` wraps every encoder/decoder block in `jax.checkpoint`
    (layer-wise rematerialization): backward recomputes block activations
    instead of keeping them live, cutting peak training memory and graph
    size for whole-volume (192^3) training.  Parameter names/shapes are
    unchanged — checkpoints stay interchangeable with remat=False."""
    in_channels: int = 1
    out_classes: int = 2
    num_encoding_blocks: int = 3
    out_channels_first_layer: int = 8
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ocfl = self.out_channels_first_layer
        nb = self.num_encoding_blocks
        x, skips = _Encoder(self.in_channels, ocfl, nb, remat=self.remat,
                            name="encoder")(x, train)
        # bottom block: conv1 keeps channels, conv2 doubles
        cb = x.shape[-1]
        bottom_cls = (nn.remat(EncodingBlock, static_argnums=(2,))
                      if self.remat else EncodingBlock)
        x = bottom_cls(cb, cb, 2 * cb, name="bottom_block")(x, train)
        # decoder channel plan: at step i, up has C_up, skip has C_up//2,
        # output C_up//2
        dec_channels = []
        c_up = 2 * cb
        for _ in range(nb - 1):
            dec_channels.append((c_up + c_up // 2, c_up // 2))
            c_up = c_up // 2
        x = _Decoder(tuple(dec_channels), remat=self.remat,
                     name="decoder")(x, skips, train)
        x = ConvBlock(c_up, self.out_classes, normalization=False,
                      activation=False, kernel_size=1, padding=0,
                      name="classifier")(x, train)
        return x
