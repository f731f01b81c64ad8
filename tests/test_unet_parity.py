"""UNet3D output parity against the reference's shipped checkpoints
(`segmentation/weights/whole_im_train_seg_parc_epoch_7.pth`).

The torch oracle below applies the checkpoint weights functionally with
torch.nn.functional following the fepegar UNet dataflow, giving an
independent validation of conv padding, BN eval statistics, PReLU and
trilinear-upsample numerics in the JAX model.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

CKPT = "/root/reference/segmentation/weights/whole_im_train_seg_parc_epoch_7.pth"


def torch_unet_forward(sd, x):
    import torch
    import torch.nn.functional as TF

    def cb(x, prefix, norm=True):
        w, b = sd[prefix + ".conv_layer.weight"], sd[prefix + ".conv_layer.bias"]
        pad = 1 if w.shape[-1] == 3 else 0
        x = TF.conv3d(x, w, b, padding=pad)
        if norm:
            x = TF.batch_norm(
                x, sd[prefix + ".norm_layer.running_mean"],
                sd[prefix + ".norm_layer.running_var"],
                sd[prefix + ".norm_layer.weight"],
                sd[prefix + ".norm_layer.bias"], training=False)
        akey = prefix + ".activation_layer.weight"
        if akey in sd:
            x = TF.prelu(x, sd[akey])
        return x

    up = lambda t: TF.interpolate(t, scale_factor=2, mode="trilinear",
                                  align_corners=False)
    e0 = cb(cb(x, "encoder.encoding_blocks.0.conv1", norm=False),
            "encoder.encoding_blocks.0.conv2")
    x = TF.max_pool3d(e0, 2)
    e1 = cb(cb(x, "encoder.encoding_blocks.1.conv1"),
            "encoder.encoding_blocks.1.conv2")
    x = TF.max_pool3d(e1, 2)
    x = cb(cb(x, "bottom_block.conv1"), "bottom_block.conv2")
    x = torch.cat([e1, up(x)], dim=1)
    x = cb(cb(x, "decoder.decoding_blocks.0.conv1"),
           "decoder.decoding_blocks.0.conv2")
    x = torch.cat([e0, up(x)], dim=1)
    x = cb(cb(x, "decoder.decoding_blocks.1.conv1"),
           "decoder.decoding_blocks.1.conv2")
    return cb(x, "classifier", norm=False)


@requires_reference
def test_unet_checkpoint_parity(rng):
    import torch

    from mri_epilepsy_diagnosis_tpu.interop import import_torch_state_dict
    from mri_epilepsy_diagnosis_tpu.models import UNet3D

    sd = torch.load(CKPT, map_location="cpu", weights_only=True)

    model = UNet3D(out_channels_first_layer=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    variables = import_torch_state_dict(variables, CKPT)

    x = rng.normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        golden = torch_unet_forward(sd, torch.tensor(x)).numpy()

    out = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)))
    out = np.moveaxis(np.asarray(out), -1, 1)
    err = np.max(np.abs(out - golden)) / (np.max(np.abs(golden)) + 1e-9)
    assert err < 1e-4, f"rel err {err}"

    # segmentation decision parity (argmax over classes)
    assert (out.argmax(1) == golden.argmax(1)).mean() > 0.999


@requires_reference
def test_unet_param_count_matches_checkpoint():
    import torch

    from mri_epilepsy_diagnosis_tpu.models import UNet3D

    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    ref_n = sum(v.numel() for k, v in sd.items()
                if ".block." not in k and "running" not in k
                and "num_batches" not in k)
    model = UNet3D(out_channels_first_layer=8)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == ref_n == 246412
