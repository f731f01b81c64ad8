"""Fader encoder/discriminator/classifier parity against the shipped
checkpoints `classification/{encoder,clf,disc}_93_6_4.pth`.

The torch oracle applies the state-dict tensors functionally following the
reference AE_model dataflow (sorted-module-dict execution order:
convx/convy/convz -> maxpool -> BN -> act for the encoder;
convs -> flatten -> linear -> BN1d -> act -> final linear for the heads).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

ENC = "/root/reference/classification/encoder_93_6_4.pth"
CLF = "/root/reference/classification/clf_93_6_4.pth"
DISC = "/root/reference/classification/disc_93_6_4.pth"

# kwargs from train_ENC_CLF.ipynb cell 17
DOWN_KW = dict(conv_k=6, conv_pad=2, conv_s=2, maxpool_k=2, maxpool_s=2,
               batch_norm=True, act="l_relu")
AE_KW = dict(c_in=1, is_skip=False, deapth=3, c_base=8, inc_size=2,
             reduce_size=False, down_block_kwargs=DOWN_KW,
             up_block_kwargs=dict(up="upsample", scale=4, scale_mode="nearest",
                                  conv_k=3, conv_pad=1, conv_s=1,
                                  batch_norm=False, act="l_relu"))
HEAD_KW = dict(c_in=32, c_out=64, conv_k=3, conv_s=1, conv_pad=0, l_in=64,
               l_out=32, batch_norm=True, act="relu", p_drop=0.5)


def torch_encoder_forward(sd, x):
    import torch
    import torch.nn.functional as TF

    for i in range(3):
        p = f"encode.{i}.block."
        x = TF.conv3d(x, sd[p + "1_convx.weight"], sd[p + "1_convx.bias"],
                      stride=(2, 1, 1), padding=(2, 0, 0))
        x = TF.conv3d(x, sd[p + "2_convy.weight"], sd[p + "2_convy.bias"],
                      stride=(1, 2, 1), padding=(0, 2, 0))
        x = TF.conv3d(x, sd[p + "3_convz.weight"], sd[p + "3_convz.bias"],
                      stride=(1, 1, 2), padding=(0, 0, 2))
        x = TF.max_pool3d(x, 2, 2)
        x = TF.batch_norm(x, sd[p + "5_batch_norm.running_mean"],
                          sd[p + "5_batch_norm.running_var"],
                          sd[p + "5_batch_norm.weight"],
                          sd[p + "5_batch_norm.bias"], training=False)
        x = TF.leaky_relu(x, 0.01)
    return x


def torch_head_forward(sd, x, prefix):
    import torch
    import torch.nn.functional as TF

    p = prefix + "."
    x = TF.conv3d(x, sd[p + "1_convx.weight"], sd[p + "1_convx.bias"])
    x = TF.conv3d(x, sd[p + "2_convy.weight"], sd[p + "2_convy.bias"])
    x = TF.conv3d(x, sd[p + "3_convz.weight"], sd[p + "3_convz.bias"])
    x = x.flatten(1)
    x = TF.linear(x, sd[p + "5_l1.weight"], sd[p + "5_l1.bias"])
    x = TF.batch_norm(x, sd[p + "6_batch_norm.running_mean"],
                      sd[p + "6_batch_norm.running_var"],
                      sd[p + "6_batch_norm.weight"],
                      sd[p + "6_batch_norm.bias"], training=False)
    x = TF.relu(x)
    return TF.linear(x, sd[p + "9_l_f.weight"], sd[p + "9_l_f.bias"])


@requires_reference
def test_fader_checkpoint_parity(rng):
    import torch

    from mri_epilepsy_diagnosis_tpu.interop import import_torch_state_dict
    from mri_epilepsy_diagnosis_tpu.models import Classificator, Discriminator
    from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder

    # 192^3 is the only spatial size the checkpointed stack accepts
    # (encoder /64 -> 3^3 latent, heads' valid k=3 conv -> 1^3).
    x = rng.normal(size=(2, 1, 192, 192, 192)).astype(np.float32) * 0.5

    enc_sd = torch.load(ENC, map_location="cpu", weights_only=True)
    clf_sd = torch.load(CLF, map_location="cpu", weights_only=True)
    disc_sd = torch.load(DISC, map_location="cpu", weights_only=True)

    with torch.no_grad():
        latent_t = torch_encoder_forward(enc_sd, torch.tensor(x))
        clf_t = torch_head_forward(clf_sd, latent_t, "clf").numpy()
        disc_t = torch_head_forward(disc_sd, latent_t, "disc").numpy()
        latent_t = latent_t.numpy()

    encoder = make_encoder(AE_KW)
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    enc_vars = encoder.init(jax.random.key(0), xj[:1, :64, :64, :64])
    enc_vars = import_torch_state_dict(enc_vars, ENC)
    latent_j, _sizes = encoder.apply(enc_vars, xj)

    lat_err = (np.abs(np.moveaxis(np.asarray(latent_j), -1, 1) - latent_t).max()
               / (np.abs(latent_t).max() + 1e-9))
    assert lat_err < 1e-4, f"latent rel err {lat_err}"

    clf = Classificator(n_class=2, **HEAD_KW)
    clf_vars = clf.init(jax.random.key(0), latent_j)
    clf_vars = import_torch_state_dict(clf_vars, CLF)
    clf_j = np.asarray(clf.apply(clf_vars, latent_j))
    assert np.abs(clf_j - clf_t).max() / (np.abs(clf_t).max() + 1e-9) < 1e-4

    disc = Discriminator(n_domains=18, **HEAD_KW)
    disc_vars = disc.init(jax.random.key(0), latent_j)
    disc_vars = import_torch_state_dict(disc_vars, DISC)
    disc_j = np.asarray(disc.apply(disc_vars, latent_j))
    assert np.abs(disc_j - disc_t).max() / (np.abs(disc_t).max() + 1e-9) < 1e-4

    # class decision parity
    assert (clf_j.argmax(-1) == clf_t.argmax(-1)).all()


def test_encoder_apply_fused_matches_module():
    """Fused separable-conv encoder path (dense composed kernels + boundary
    bias field) == Encoder.apply, for both the flagship k6/s2 config and the
    default k3/s1."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_epilepsy_diagnosis_tpu.models.fader import (encoder_apply_fused,
                                                         make_encoder)

    rng = np.random.default_rng(0)
    for dbk, size in ((dict(conv_k=6, conv_pad=2, conv_s=2, maxpool_k=2,
                            maxpool_s=2, batch_norm=True, act="l_relu"), 64),
                      (dict(conv_k=3, conv_pad=1, conv_s=1, maxpool_k=2,
                            maxpool_s=2, batch_norm=True, act="relu"), 16)):
        ae_kwargs = dict(c_in=1, is_skip=False, deapth=3, c_base=8,
                         inc_size=2, reduce_size=False,
                         down_block_kwargs=dbk)
        enc = make_encoder(ae_kwargs)
        x0 = jnp.asarray(rng.normal(size=(2, size, size, size, 1)),
                         jnp.float32)
        v = enc.init(jax.random.key(1), x0)
        _, nv = enc.apply(v, x0, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": nv["batch_stats"]}
        ref, sizes_ref = enc.apply(v, x0)
        out, sizes = encoder_apply_fused(v, x0, ae_kwargs)
        assert sizes == sizes_ref
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_encoder_apply_packed_matches_module():
    """Packed-layout encoder (models/fader_packed.py) == Encoder.apply: the
    strided separable convs collapse exactly onto packed cells and the 2^3
    pool onto sub-groups, with trained (non-default) batch stats.  64^3
    packs all three blocks; 40^3 exercises the fine fallback for the deep
    non-divisible block."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
    from mri_epilepsy_diagnosis_tpu.models.fader_packed import (
        encoder_apply_packed)

    rng = np.random.default_rng(0)
    for size, depth in ((64, 3), (40, 2)):
        ae_kwargs = dict(c_in=1, is_skip=False, deapth=depth, c_base=8,
                         inc_size=2, reduce_size=False,
                         down_block_kwargs=dict(
                             conv_k=6, conv_pad=2, conv_s=2, maxpool_k=2,
                             maxpool_s=2, batch_norm=True, act="l_relu"))
        enc = make_encoder(ae_kwargs)
        x0 = jnp.asarray(rng.normal(size=(2, size, size, size, 1)),
                         jnp.float32)
        v = enc.init(jax.random.key(1), x0)
        _, nv = enc.apply(v, x0, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": nv["batch_stats"]}
        ref, sizes_ref = enc.apply(v, x0)
        out, sizes = jax.jit(
            lambda v, x: encoder_apply_packed(v, x, ae_kwargs))(v, x0)
        assert tuple(map(tuple, sizes)) == tuple(map(tuple, sizes_ref))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
