"""Whole-volume classification CNN zoo.

Capability-parity with `classification/models/cnn_model.py` (reference):
VoxResNet (3D ResNet), plain CNN (VGG-ish 3D), ConvLSTM (CNN per frame +
LSTM head for 4D fMRI) and DilatedCNN (the classification baseline on 180^3
volumes, `baseline_sample_classification.ipynb`).

Layout is channels-last; Flatten uses torch's (N,C,D,H,W) element order so a
`.pth` import of the FC layers is weight-exact.  Module names render to the
reference's Sequential key layout (`model.conv3d_1.weight`, ...).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import functional as F
from ..ops.layers import BatchNorm, Conv3d, Dropout, Linear


def _flatten_torch_order(x):
    n = x.shape[0]
    return jnp.moveaxis(x, -1, 1).reshape(n, -1)


def _relu(x):
    return jnp.maximum(x, 0)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


class BasicBlock(nn.Module):
    """3D residual block: conv-bn-relu-conv-bn + identity, relu."""
    inplanes: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv3d(self.inplanes, self.planes, 3, stride=self.stride,
                     padding=1, use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, not train)
        out = _relu(out)
        out = Conv3d(self.planes, self.planes, 3, padding=1, use_bias=False,
                     name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, not train)
        return _relu(out + residual)


class VoxResNet(nn.Module):
    """3D ResNet classifier (reference `VoxResNet`).

    Note: the reference registers "activation_6" twice when n_blocks >= 4
    (OrderedDict overwrite keeps the first position), so for n_blocks >= 4
    there is no activation after fully_conn_1 — replicated here.
    """
    input_shape: Sequence[int] = (128, 128, 128)
    num_classes: int = 2
    n_filters: int = 32
    stride: int = 2
    n_blocks: int = 3
    n_flatten_units: int | None = None
    dropout: float = 0.0
    n_fc_units: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.n_filters
        x = Conv3d(1, nf, 3, stride=self.stride, padding=1,
                   name="model__conv3d_1")(x)
        x = BatchNorm(nf, name="model__batch_norm_1")(x, not train)
        x = _relu(x)
        x = Conv3d(nf, nf, 3, padding=1, name="model__conv3d_2")(x)
        x = BatchNorm(nf, name="model__batch_norm_2")(x, not train)
        x = _relu(x)

        x = Conv3d(nf, 2 * nf, 3, stride=2, padding=1, name="model__conv3d_3")(x)
        x = BasicBlock(2 * nf, 2 * nf, name="model__block_1")(x, train)
        x = BasicBlock(2 * nf, 2 * nf, name="model__block_2")(x, train)
        x = BatchNorm(2 * nf, name="model__batch_norm_3")(x, not train)
        x = _relu(x)

        if self.n_blocks >= 2:
            x = Conv3d(2 * nf, 2 * nf, 3, stride=2, padding=1,
                       name="model__conv3d_4")(x)
            x = BasicBlock(2 * nf, 2 * nf, name="model__block_3")(x, train)
            x = BasicBlock(2 * nf, 2 * nf, name="model__block_4")(x, train)
            x = BatchNorm(2 * nf, name="model__batch_norm_4")(x, not train)
            x = _relu(x)

        if self.n_blocks >= 3:
            x = Conv3d(2 * nf, 4 * nf, 3, stride=2, padding=1,
                       name="model__conv3d_5")(x)
            x = BasicBlock(4 * nf, 4 * nf, name="model__block_5")(x, train)
            x = BasicBlock(4 * nf, 4 * nf, name="model__block_6")(x, train)
            x = BatchNorm(4 * nf, name="model__batch_norm_5")(x, not train)
            x = _relu(x)

        if self.n_blocks >= 4:
            x = Conv3d(4 * nf, 4 * nf, 3, stride=2, padding=1,
                       name="model__conv3d_6")(x)
            x = BasicBlock(4 * nf, 4 * nf, name="model__block_7")(x, train)
            x = BasicBlock(4 * nf, 4 * nf, name="model__block_8")(x, train)
            x = BatchNorm(4 * nf, name="model__batch_norm_6")(x, not train)
            x = _relu(x)

        n_flat = self.n_flatten_units
        if n_flat is None:
            n_flat = 4 * nf * int(np.prod(
                np.array(self.input_shape) // (2 ** self.n_blocks * self.stride)))
        x = _flatten_torch_order(x)
        x = Linear(n_flat, self.n_fc_units, name="model__fully_conn_1")(x)
        if self.n_blocks < 4:
            x = _relu(x)
        x = Dropout(self.dropout, name="model__dropout_1")(x, deterministic=not train)
        x = Linear(self.n_fc_units, self.num_classes, name="model__fully_conn_2")(x)
        return x


class CNN(nn.Module):
    """VGG-ish 3D CNN feature extractor (reference `CNN`).

    Output is the n_fc_units embedding (BN1d + ReLU applied), as in the
    reference, which composes it with an LSTM head (`ConvLSTM`).
    """
    input_shape: Sequence[int] = (64, 76, 48)
    n_filters: int = 16
    n_blocks: int = 3
    stride: int = 1
    n_fc_units: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.n_filters
        x = Conv3d(1, nf, 3, stride=self.stride, padding=1,
                   name="model__conv3d_1")(x)
        x = BatchNorm(nf, name="model__batch_norm_1")(x, not train)
        x = _relu(x)
        x = Conv3d(nf, nf, 3, padding=1, name="model__conv3d_2")(x)
        x = BatchNorm(nf, name="model__batch_norm_2")(x, not train)
        x = _relu(x)
        x = F.maxpool3d(x, 2)

        if self.n_blocks >= 2:
            x = Conv3d(nf, 2 * nf, 3, padding=1, name="model__conv3d_3")(x)
            x = BatchNorm(2 * nf, name="model__batch_norm_3")(x, not train)
            x = _relu(x)
            x = Conv3d(2 * nf, 2 * nf, 3, padding=1, name="model__conv3d_4")(x)
            x = BatchNorm(2 * nf, name="model__batch_norm_4")(x, not train)
            x = _relu(x)
            x = F.maxpool3d(x, 2)

        if self.n_blocks >= 3:
            x = Conv3d(2 * nf, 4 * nf, 3, padding=1, name="model__conv3d_5")(x)
            x = BatchNorm(4 * nf, name="model__batch_norm_5")(x, not train)
            x = _relu(x)
            x = Conv3d(4 * nf, 4 * nf, 3, padding=1, name="model__conv3d_6")(x)
            x = BatchNorm(4 * nf, name="model__batch_norm_6")(x, not train)
            x = _relu(x)
            x = F.maxpool3d(x, 2)

        if self.n_blocks >= 4:
            x = Conv3d(4 * nf, 8 * nf, 3, padding=1, name="model__conv3d_7")(x)
            x = BatchNorm(8 * nf, name="model__batch_norm_7")(x, not train)
            x = _relu(x)
            x = Conv3d(8 * nf, 8 * nf, 3, padding=1, name="model__conv3d_8")(x)
            x = BatchNorm(8 * nf, name="model__batch_norm_8")(x, not train)
            x = _relu(x)
            x = F.maxpool3d(x, 2)

        mult = {1: nf, 2: 2 * nf, 3: 4 * nf, 4: 8 * nf}[self.n_blocks]
        div = 2 ** self.n_blocks * self.stride
        n_flat = mult * int(np.prod([s // div for s in self.input_shape]))
        x = _flatten_torch_order(x)
        x = Linear(n_flat, self.n_fc_units, name="model__fully_conn_1")(x)
        x = BatchNorm(self.n_fc_units, name="model__batch_norm_9")(x, not train)
        x = _relu(x)
        return x


class LSTM(nn.Module):
    """Multi-layer LSTM with torch nn.LSTM(batch_first=True) semantics and
    torch parameter layout (weight_ih_l{k}: stored (in, 4H); gates i,f,g,o)."""
    input_size: int
    hidden_size: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):  # x: (N, T, F)
        h = x
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size
            k = 1.0 / np.sqrt(self.hidden_size)
            init = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -k, k)
            w_ih = self.param(f"weight_ih_l{layer}", init, (in_size, 4 * self.hidden_size))
            w_hh = self.param(f"weight_hh_l{layer}", init, (self.hidden_size, 4 * self.hidden_size))
            b_ih = self.param(f"bias_ih_l{layer}", init, (4 * self.hidden_size,))
            b_hh = self.param(f"bias_hh_l{layer}", init, (4 * self.hidden_size,))

            def step(carry, xt):
                hprev, cprev = carry
                gates = xt @ w_ih + hprev @ w_hh + b_ih + b_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c = f * cprev + i * g
                hnew = o * jnp.tanh(c)
                return (hnew, c), hnew

            n = h.shape[0]
            h0 = jnp.zeros((n, self.hidden_size), h.dtype)
            (_, _), hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(h, 0, 1))
            h = jnp.swapaxes(hs, 0, 1)
        return h


class ConvLSTM(nn.Module):
    """CNN-per-frame + LSTM head for 4D fMRI (reference `ConvLSTM`)."""
    input_shape: Sequence[int] = (48, 64, 32)
    n_outputs: int = 1
    hidden_size: int = 128
    n_layers: int = 2
    n_fc_units_rnn: int = 128
    dropout: float = 0.0
    stride: int = 1
    n_filters: int = 16
    n_blocks: int = 3
    n_fc_units_cnn: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, T, D, H, W, C)
        n, t = x.shape[:2]
        frames = x.reshape((n * t,) + x.shape[2:])
        feats = CNN(self.input_shape, self.n_filters, self.n_blocks,
                    self.stride, self.n_fc_units_cnn, name="model")(frames, train)
        feats = feats.reshape(n, t, -1)
        out = LSTM(self.n_fc_units_cnn, self.hidden_size, self.n_layers,
                   name="lstm")(feats)
        out = Linear(self.hidden_size, self.n_fc_units_rnn, name="fc1")(out[:, -1, :])
        out = _relu(out)
        out = Linear(self.n_fc_units_rnn, self.n_outputs, name="fc2")(out)
        return out


class DilatedCNN(nn.Module):
    """Dilated 3D CNN classification baseline (reference `DilatedCNN`).

    As in the reference, the final Softmax is part of the model, so the
    output is a probability vector (the reference's train loop applies
    CrossEntropy on top of it — semantics preserved by the trainer).
    """
    input_shape: Sequence[int] = (180, 180, 180)
    n_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nc = self.n_channels
        x = Conv3d(1, nc, 3, stride=2, dilation=3, name="model__conv3d_1")(x)
        x = BatchNorm(nc, name="model__batch_norm_1")(x, not train)
        x = _lrelu(x)
        x = Conv3d(nc, nc, 3, stride=1, dilation=3, padding=3,
                   name="model__conv3d_2")(x)
        x = BatchNorm(nc, name="model__batch_norm_2")(x, not train)
        x = _lrelu(x)
        x = F.maxpool3d(x, 4, 2)

        x = Conv3d(nc, 2 * nc, 3, stride=2, dilation=3, name="model__conv3d_3")(x)
        x = BatchNorm(2 * nc, name="model__batch_norm_3")(x, not train)
        x = _lrelu(x)
        x = Conv3d(2 * nc, 2 * nc, 3, stride=1, dilation=3, padding=3,
                   name="model__conv3d_4")(x)
        x = BatchNorm(2 * nc, name="model__batch_norm_4")(x, not train)
        x = _lrelu(x)
        x = F.maxpool3d(x, 4, 2)

        x = Conv3d(2 * nc, 4 * nc, 3, dilation=3, padding=3,
                   name="model__conv3d_5")(x)
        x = BatchNorm(4 * nc, name="model__batch_norm_5")(x, not train)
        x = _lrelu(x)
        x = Conv3d(4 * nc, 4 * nc, 3, dilation=3, stride=1,
                   name="model__conv3d_6")(x)
        x = BatchNorm(4 * nc, name="model__batch_norm_6")(x, not train)
        x = _lrelu(x)

        n_flat = 4 * nc * ((self.input_shape[0] - 61) // 16 - 5) ** 3
        x = _flatten_torch_order(x)
        x = Linear(n_flat, 256, name="model__fully_conn_1")(x)
        x = _lrelu(x)
        x = Linear(256, 128, name="model__fully_conn_2")(x)
        x = _lrelu(x)
        x = Linear(128, 2, name="model__fully_conn_3")(x)
        return jax.nn.softmax(x, axis=-1)
