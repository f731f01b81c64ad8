"""Fader-network family: separable-conv autoencoder, encoder, decoder,
domain discriminator and classifier.

Capability-parity with `classification/models/AE_model.py` (reference):
every conv is separable — (k,1,1) then (1,k,1) then (1,1,k) — which on TPU
XLA lowers to three thin contractions that fuse well with the following
elementwise ops.  kwargs schemas are preserved verbatim (`down_block_kwargs`,
`up_block_kwargs`, `ae_kwargs`, `discriminator_kwargs`, `classificator_kwargs`
from `train_AE.ipynb` cell 8 / `train_ENC_CLF.ipynb` cell 17) so reference
configs drop in unchanged.

Module names mirror the torch state-dict layout of the shipped checkpoints
(`classification/{encoder,clf,disc}_93_6_4.pth`): a double underscore in a
linen module name renders as '.' in the torch key (see interop), e.g.
`encode__0` -> `encode.0`, `block__1_convx` -> `block.1_convx`.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import functional as F
from ..ops.layers import (BatchNorm, Conv3d, ConvTranspose3d, Dropout, Linear,
                          xavier_uniform_gain)


def _gain(act: str) -> float:
    # torch nn.init.calculate_gain('leaky_relu', 0.01) / ('relu')
    if act == "l_relu":
        return math.sqrt(2.0 / (1 + 0.01 ** 2))
    return math.sqrt(2.0)


def _act(act: str):
    if act == "l_relu":
        return lambda x: jnp.where(x >= 0, x, 0.01 * x)
    return lambda x: jnp.maximum(x, 0)


def _flatten_torch_order(x):
    """Flatten (N,D,H,W,C) in torch's (N,C,D,H,W) element order so imported
    Linear weights line up."""
    n = x.shape[0]
    return jnp.moveaxis(x, -1, 1).reshape(n, -1)


class DownBlock(nn.Module):
    """separable conv x3 -> maxpool -> [BN] -> act. Returns (y, pre-pool shape)."""
    c_in: int
    c_out: int
    conv_k: int = 3
    conv_s: int = 1
    conv_pad: int = 1
    maxpool_k: int = 2
    maxpool_s: int = 2
    batch_norm: bool = True
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        wi = xavier_uniform_gain(_gain(self.act))
        bi = nn.initializers.zeros
        k, s, p = self.conv_k, self.conv_s, self.conv_pad
        x = Conv3d(self.c_in, self.c_out, (k, 1, 1), stride=(s, 1, 1),
                   padding=(p, 0, 0), weight_init=wi, bias_init=bi,
                   name="block__1_convx")(x)
        x = Conv3d(self.c_out, self.c_out, (1, k, 1), stride=(1, s, 1),
                   padding=(0, p, 0), weight_init=wi, bias_init=bi,
                   name="block__2_convy")(x)
        x = Conv3d(self.c_out, self.c_out, (1, 1, k), stride=(1, 1, s),
                   padding=(0, 0, p), weight_init=wi, bias_init=bi,
                   name="block__3_convz")(x)
        shape_before_pool = tuple(x.shape[1:4])
        x = F.maxpool3d(x, self.maxpool_k, self.maxpool_s)
        if self.batch_norm:
            x = BatchNorm(self.c_out, name="block__5_batch_norm")(
                x, use_running_average=not train)
        x = _act(self.act)(x)
        return x, shape_before_pool


class UpBlock(nn.Module):
    """upsample (nearest/linear or transpose conv) -> odd-size fixup ->
    separable conv x3 -> [BN] -> act."""
    c_in: int
    c_out: int
    up: str = "upsample"          # or 'transpose_conv'
    scale: int = 2
    scale_mode: str = "nearest"
    t_conv_pad: int = 0
    conv_k: int = 3
    conv_s: int = 1
    conv_pad: int = 1
    batch_norm: bool = True
    act: str = "relu"

    @nn.compact
    def __call__(self, x, shape_before_pool=None, train: bool = False):
        wi = xavier_uniform_gain(_gain(self.act))
        bi = nn.initializers.zeros
        if self.up == "transpose_conv":
            x = ConvTranspose3d(self.c_in, self.c_out, self.scale,
                                stride=self.scale, padding=self.t_conv_pad,
                                name="block__1_upsample")(x)
        else:
            out_sp = tuple(self.scale * s for s in x.shape[1:4])
            if self.scale_mode == "nearest":
                x = F.resize_nearest(x, out_sp)
            else:
                x = F.resize_linear(x, out_sp, align_corners=False)
        if shape_before_pool is not None and any(
                t > c for t, c in zip(shape_before_pool, x.shape[1:4])):
            # reference fixup: F.interpolate(x, shape_before_pool) — nearest
            x = F.resize_nearest(x, shape_before_pool)
        # NB: reference declares 2_convx with in_channels=c_in even when a
        # transpose_conv has already mapped channels to c_out; we use the
        # channel count that actually arrives (identical when up='upsample',
        # which is the only mode the reference ever runs).
        k, s, p = self.conv_k, self.conv_s, self.conv_pad
        c2_in = self.c_out if self.up == "transpose_conv" else self.c_in
        x = Conv3d(c2_in, self.c_out, (k, 1, 1), stride=(s, 1, 1),
                   padding=(p, 0, 0), weight_init=wi, bias_init=bi,
                   name="block__2_convx")(x)
        x = Conv3d(self.c_out, self.c_out, (1, k, 1), stride=(1, s, 1),
                   padding=(0, p, 0), weight_init=wi, bias_init=bi,
                   name="block__3_convy")(x)
        x = Conv3d(self.c_out, self.c_out, (1, 1, k), stride=(1, 1, s),
                   padding=(0, 0, p), weight_init=wi, bias_init=bi,
                   name="block__4_convz")(x)
        if self.batch_norm:
            x = BatchNorm(self.c_out, name="block__5_batch_norm")(
                x, use_running_average=not train)
        x = _act(self.act)(x)
        return x


class Encoder(nn.Module):
    """Stack of DownBlocks; returns (latent, size_list)."""
    deapth: int
    chanels: Sequence[int]
    down_block_kwargs: Dict[str, Any]
    reduce_size: bool = False
    skip_map: Optional[Sequence[bool]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        offset = 0
        if self.reduce_size:
            x = Conv3d(1, 1, 4, stride=4, padding=0, name="encode__0")(x)
            offset = 1
        size_list = []
        for i in range(self.deapth):
            blk = DownBlock(c_in=self.chanels[i], c_out=self.chanels[i + 1],
                            name=f"encode__{i + offset}",
                            **self.down_block_kwargs)
            x, size = blk(x, train)
            size_list.append(size)
        return x, size_list


class Decoder(nn.Module):
    deapth: int
    chanels: Sequence[int]  # reversed channel list
    up_block_kwargs: Dict[str, Any]
    reduce_size: bool = False
    skip_map: Optional[Sequence[bool]] = None

    @nn.compact
    def __call__(self, x, size_list, train: bool = False):
        sizes = list(size_list)[::-1]
        for i in range(self.deapth):
            blk = UpBlock(c_in=self.chanels[i], c_out=self.chanels[i + 1],
                          name=f"decode__{i}", **self.up_block_kwargs)
            x = blk(x, sizes[i], train)
        if self.reduce_size:
            x = ConvTranspose3d(1, 1, 4, stride=4, padding=0,
                                name=f"decode__{self.deapth}")(x)
        x = Conv3d(1, 1, 3, stride=1, padding=1, name="vox")(x)
        return x


def _build_channels(c_in: int, c_base: int, inc_size: int, deapth: int):
    chanels = [c_in]
    c = c_base
    for _ in range(deapth):
        chanels.append(c)
        c = inc_size * c
    return chanels


class AE(nn.Module):
    """Autoencoder; `ae_kwargs` schema of the reference preserved."""
    c_in: int = 1
    deapth: int = 3
    c_base: int = 8
    inc_size: int = 2
    is_skip: bool = False
    skip_map: Optional[Sequence[bool]] = None
    reduce_size: bool = False
    down_block_kwargs: Optional[Dict[str, Any]] = None
    up_block_kwargs: Optional[Dict[str, Any]] = None

    def setup(self):
        chanels = _build_channels(self.c_in, self.c_base, self.inc_size,
                                  self.deapth)
        self.enc = Encoder(deapth=self.deapth, chanels=tuple(chanels),
                           reduce_size=self.reduce_size,
                           down_block_kwargs=dict(self.down_block_kwargs),
                           name="enc")
        self.dec = Decoder(deapth=self.deapth, chanels=tuple(chanels[::-1]),
                           reduce_size=self.reduce_size,
                           up_block_kwargs=dict(self.up_block_kwargs),
                           name="dec")

    def __call__(self, x, train: bool = False):
        z, size_list = self.enc(x, train)
        return self.dec(z, size_list, train)

    def encode(self, x, train: bool = False):
        return self.enc(x, train)


def make_encoder(ae_kwargs: Dict[str, Any]) -> Encoder:
    """Standalone encoder with the same state-dict layout as
    `AE(**ae_kwargs).enc` in the reference (keys `encode.N....`)."""
    chanels = _build_channels(ae_kwargs["c_in"], ae_kwargs["c_base"],
                              ae_kwargs["inc_size"], ae_kwargs["deapth"])
    return Encoder(deapth=ae_kwargs["deapth"], chanels=tuple(chanels),
                   reduce_size=ae_kwargs.get("reduce_size", False),
                   down_block_kwargs=dict(ae_kwargs["down_block_kwargs"]))


def _conv_head(prefix, x, *, c_in, c_out, conv_k, conv_s, conv_pad, l_in,
               l_out, n_final, batch_norm, act, p_drop, train):
    """Shared Discriminator/Classificator body. Returns (logits, hidden),
    hidden = post-dropout embedding used by the reference's t-SNE analysis
    (`train_ENC_CLF.ipynb` cells 26/28)."""
    wi = xavier_uniform_gain(_gain(act))
    bi = nn.initializers.zeros
    k, s, p = conv_k, conv_s, conv_pad
    x = Conv3d(c_in, c_out, (k, 1, 1), stride=(s, 1, 1), padding=(p, 0, 0),
               weight_init=wi, bias_init=bi, name=f"{prefix}__1_convx")(x)
    x = Conv3d(c_out, c_out, (1, k, 1), stride=(1, s, 1), padding=(0, p, 0),
               weight_init=wi, bias_init=bi, name=f"{prefix}__2_convy")(x)
    x = Conv3d(c_out, c_out, (1, 1, k), stride=(1, 1, s), padding=(0, 0, p),
               weight_init=wi, bias_init=bi, name=f"{prefix}__3_convz")(x)
    x = _flatten_torch_order(x)
    x = Linear(l_in, l_out, name=f"{prefix}__5_l1")(x)
    if batch_norm:
        x = BatchNorm(l_out, name=f"{prefix}__6_batch_norm")(
            x, use_running_average=not train)
    x = _act(act)(x)
    x = Dropout(p_drop, name=f"{prefix}__8_drop")(x, deterministic=not train)
    hidden = x
    x = Linear(l_out, n_final, name=f"{prefix}__9_l_f")(x)
    return x, hidden


class Discriminator(nn.Module):
    """Domain (scanner) discriminator; `discriminator_kwargs` schema preserved."""
    c_in: int
    c_out: int
    conv_k: int
    conv_s: int
    conv_pad: int
    l_in: int
    l_out: int
    n_domains: int
    batch_norm: bool = True
    act: str = "relu"
    p_drop: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, return_hidden: bool = False):
        logits, hidden = _conv_head(
            "disc", x, c_in=self.c_in, c_out=self.c_out, conv_k=self.conv_k,
            conv_s=self.conv_s, conv_pad=self.conv_pad, l_in=self.l_in,
            l_out=self.l_out, n_final=self.n_domains,
            batch_norm=self.batch_norm, act=self.act, p_drop=self.p_drop,
            train=train)
        return (logits, hidden) if return_hidden else logits


class Classificator(nn.Module):
    """FCD / no-FCD classifier head; `classificator_kwargs` schema preserved."""
    c_in: int
    c_out: int
    conv_k: int
    conv_s: int
    conv_pad: int
    l_in: int
    l_out: int
    n_class: int
    batch_norm: bool = True
    act: str = "relu"
    p_drop: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, return_hidden: bool = False):
        logits, hidden = _conv_head(
            "clf", x, c_in=self.c_in, c_out=self.c_out, conv_k=self.conv_k,
            conv_s=self.conv_s, conv_pad=self.conv_pad, l_in=self.l_in,
            l_out=self.l_out, n_final=self.n_class,
            batch_norm=self.batch_norm, act=self.act, p_drop=self.p_drop,
            train=train)
        return (logits, hidden) if return_hidden else logits


# ---------------------------------------------------------------------------
# fused separable-conv execution path (eval)
#
# Each DownBlock runs three thin-channel separable convs ((k,1,1)/(1,k,1)/
# (1,1,k), C = 8-32), whose intermediates pad the lane dim up to 128 — on
# TPU the first block's intermediate alone costs ~900 MB of padded HBM
# traffic per volume.  The three convs compose EXACTLY into one dense
# k^3 conv (the x-dependent parts share zero padding; the biases propagate
# position-dependently near boundaries and are added as a separable (h, w)
# bias field).  2.1x FLOPs for ~4x less traffic on the flagship 192^3
# ensemble input — and the k^3·Ci contraction is MXU-friendly.
# ---------------------------------------------------------------------------


def _axis_valid_mask(size_in: int, size_out: int, k: int, s: int, p: int):
    """(size_out, k) 0/1 mask: tap b of output position h reads a valid
    input index (s*h + b - p in range)."""
    import numpy as _np

    h = _np.arange(size_out)[:, None]
    b = _np.arange(k)[None, :]
    idx = s * h + b - p
    return ((idx >= 0) & (idx < size_in)).astype(_np.float32)


def fused_downblock_apply(params, stats, x, *, conv_k=3, conv_s=1,
                          conv_pad=1, maxpool_k=2, maxpool_s=2,
                          batch_norm=True, act="relu"):
    """Eval-mode DownBlock with the three separable convs fused into one
    dense conv + separable boundary-exact bias field.  Same variables, same
    numerics as `DownBlock.__call__(train=False)`."""
    wx = params["block__1_convx"]["weight"]  # (k,1,1,ci,m)
    wy = params["block__2_convy"]["weight"]  # (1,k,1,m,m)
    wz = params["block__3_convz"]["weight"]  # (1,1,k,m,co)
    bx = params["block__1_convx"].get("bias")
    by = params["block__2_convy"].get("bias")
    bz = params["block__3_convz"].get("bias")
    k, s, p = conv_k, conv_s, conv_pad

    wxa = wx[:, 0, 0]                       # (k, ci, m)
    wyb = wy[0, :, 0]                       # (k, m, m2)
    wzc = wz[0, 0, :]                       # (k, m2, co)
    w = jnp.einsum("aim,bmn,cno->abcio", wxa.astype(jnp.float32),
                   wyb.astype(jnp.float32), wzc.astype(jnp.float32),
                   precision=F._precision_for(x.dtype)).astype(x.dtype)
    y = F.conv3d(x, w, None, stride=s, padding=p)

    # position-dependent bias: bx flows through convy's h-taps and convz's
    # w-taps (zero padding truncates the constant field at boundaries),
    # by through convz's w-taps, bz is uniform
    h_in, w_in = x.shape[2], x.shape[3]
    h_out, w_out = y.shape[2], y.shape[3]
    f32 = jnp.float32
    bias_h = jnp.zeros((h_out, wyb.shape[2]), f32)
    if by is not None:
        bias_h = bias_h + by.astype(f32)
    if bx is not None:
        my = jnp.asarray(_axis_valid_mask(h_in, h_out, k, s, p))
        sy = jnp.einsum("hb,bmn->hmn", my, wyb.astype(f32))
        bias_h = bias_h + jnp.einsum("m,hmn->hn", bx.astype(f32), sy)
    mz = jnp.asarray(_axis_valid_mask(w_in, w_out, k, s, p))
    sz = jnp.einsum("wb,bno->wno", mz, wzc.astype(f32))
    bias_hw = jnp.einsum("hn,wno->hwo", bias_h, sz)
    if bz is not None:
        bias_hw = bias_hw + bz.astype(f32)
    y = y + bias_hw[None, None].astype(y.dtype)

    shape_before_pool = tuple(y.shape[1:4])
    y = F.maxpool3d(y, maxpool_k, maxpool_s)
    if batch_norm:
        bn = params["block__5_batch_norm"]
        st = stats["block__5_batch_norm"]
        y = F.batch_norm(y, st["running_mean"], st["running_var"],
                         bn["weight"], bn["bias"])
    return _act(act)(y), shape_before_pool


def encoder_apply_fused(variables, x, ae_kwargs):
    """Eval-mode `Encoder.apply` (latent, size_list) with every DownBlock's
    separable convs fused (see `fused_downblock_apply`).  Parity with
    `make_encoder(ae_kwargs).apply(variables, x)` is test-verified."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    offset = 1 if ae_kwargs.get("reduce_size") else 0
    if offset:
        w = params["encode__0"]["weight"]
        b = params["encode__0"].get("bias")
        x = F.conv3d(x, w.astype(x.dtype), b, stride=4, padding=0)
    dbk = dict(ae_kwargs["down_block_kwargs"])
    size_list = []
    for i in range(ae_kwargs["deapth"]):
        key = f"encode__{i + offset}"
        x, size = fused_downblock_apply(
            params[key], stats.get(key, {}), x,
            conv_k=dbk.get("conv_k", 3), conv_s=dbk.get("conv_s", 1),
            conv_pad=dbk.get("conv_pad", 1),
            maxpool_k=dbk.get("maxpool_k", 2),
            maxpool_s=dbk.get("maxpool_s", 2),
            batch_norm=dbk.get("batch_norm", True),
            act=dbk.get("act", "relu"))
        size_list.append(size)
    return x, size_list
