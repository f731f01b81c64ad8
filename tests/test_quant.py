"""int8 post-training quantization of the packed-v2 inference path
(`models/unet_packed_q.py`).

Quality bar: the quantized forward must reproduce the exact float path's
segmentation decisions — gated both on a random-init model and on the
reference's shipped checkpoint
(`segmentation/weights/whole_im_train_seg_parc_epoch_7.pth`) driven with a
structured synthetic volume (no MRI bank in the image, see SURVEY §6).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.models import unet_packed_q as Q
from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
    fold_bn_inference, packed_unet_apply_v2, packed_unet_mask_v2)

CKPT = "/root/reference/segmentation/weights/whole_im_train_seg_parc_epoch_7.pth"


def _random_model(rng, s=32, batch=2):
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    x = jnp.asarray(rng.normal(size=(batch, s, s, s, 1)), jnp.float32)
    return variables, x


def test_quantize_weight_per_oc_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(2, 2, 2, 16, 24)), jnp.float32)
    w8, scale = Q.quantize_weight_per_oc(w)
    assert w8.dtype == jnp.int8
    back = np.asarray(w8, np.float32) * np.asarray(scale)
    # per-output-channel symmetric quantization: error <= scale/2 per entry
    assert np.all(np.abs(back - np.asarray(w)) <= np.asarray(scale) / 2 + 1e-7)
    # the max-magnitude entry of each output channel hits +-127 exactly
    assert np.all(np.max(np.abs(np.asarray(w8)), axis=(0, 1, 2, 3)) == 127)


def test_calibrate_covers_all_sites(rng):
    variables, x = _random_model(rng)
    scales = Q.calibrate(fold_bn_inference(variables), x)
    assert set(scales) == set(Q.site_names(3))
    assert all(np.all(v > 0) for v in scales.values())
    # per-fine-channel ranges: one entry per conv output channel
    # (ocfl=8, nb=3: e0 conv1 -> 8 ch; bottom conv2 -> 64 ch)
    assert scales["e0c1"].shape == (8,) and scales["bc2"].shape == (64,)


def test_int8_trunk_jits(rng):
    variables, x = _random_model(rng, s=16, batch=1)
    q = Q.quantize_inference(variables, x)
    eager = Q.packed_unet_mask_v2_int8(q, x)
    jitted = jax.jit(Q.packed_unet_mask_v2_int8)(q, x)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(jitted))


def test_int8_logits_match_float_random_init(rng):
    variables, x = _random_model(rng)
    ref = np.asarray(packed_unet_apply_v2(fold_bn_inference(variables), x),
                     np.float32)
    q = Q.quantize_inference(variables, x)
    out = np.asarray(Q.packed_unet_apply_v2_int8(q, x), np.float32)
    nrmse = np.sqrt(((out - ref) ** 2).mean()) / ref.std()
    assert nrmse < 0.02, f"int8 logits NRMSE {nrmse}"
    mask8 = np.asarray(Q.packed_unet_mask_v2_int8(q, x))
    agree = (mask8 == ref.argmax(-1)).mean()
    assert agree > 0.995, f"mask agreement {agree}"


def test_quantize_accepts_folded_and_live_bn(rng):
    variables, x = _random_model(rng, s=16, batch=1)
    q_live = Q.quantize_inference(variables, x)
    q_fold = Q.quantize_inference(fold_bn_inference(variables), x)
    a = np.asarray(Q.packed_unet_apply_v2_int8(q_live, x))
    b = np.asarray(Q.packed_unet_apply_v2_int8(q_fold, x))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def _blob_volume(rng, s):
    """Structured pseudo-brain: a bright centered ellipsoid + texture,
    z-normalized — drives the checkpoint with anatomy-like contrast."""
    g = np.stack(np.meshgrid(*[np.linspace(-1, 1, s)] * 3, indexing="ij"))
    r2 = (g[0] / 0.7) ** 2 + (g[1] / 0.8) ** 2 + (g[2] / 0.6) ** 2
    vol = np.where(r2 < 1.0, 1.0, 0.0) * (1.0 + 0.2 * np.sin(8 * g[0]))
    vol = vol + 0.05 * rng.normal(size=(s, s, s))
    vol = (vol - vol.mean()) / vol.std()
    return vol.astype(np.float32)[None, ..., None]


@requires_reference
def test_int8_mask_parity_on_shipped_checkpoint(rng):
    """Quality gate for the int8 path on real weights.

    int8 cannot reproduce the float mask bit-for-bit; what it must
    guarantee is that every disagreement is benign BOUNDARY JITTER — a
    voxel the float model itself was indifferent about — rather than a
    structural error.  Measured on this checkpoint+volume (round 3):
    1.26% of voxels disagree, all within ~1 voxel of the float boundary,
    with a median float logit margin of 1.0 at the flips vs 38.9 globally."""
    from scipy import ndimage

    from mri_epilepsy_diagnosis_tpu.interop import import_torch_state_dict
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2)

    model = UNet3D(out_channels_first_layer=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    variables = import_torch_state_dict(variables, CKPT)
    x = jnp.asarray(_blob_volume(rng, 64))

    vf = fold_bn_inference(variables)
    logits = np.asarray(packed_unet_apply_v2(vf, x), np.float32)
    ref_mask = logits.argmax(-1)
    assert 0.01 < ref_mask.mean() < 0.99  # the volume produces a real mask

    q = Q.quantize_inference(variables, x)
    mask8 = np.asarray(Q.packed_unet_mask_v2_int8(q, x))
    agree = (mask8 == ref_mask).mean()
    assert agree > 0.98, f"int8 vs float mask agreement {agree}"

    inter = np.logical_and(mask8 == 1, ref_mask == 1).sum()
    dice = 2 * inter / (mask8.sum() + ref_mask.sum())
    assert dice > 0.985, f"int8 vs float foreground dice {dice}"

    dis = (mask8 != ref_mask)[0]
    if dis.any():
        # every flip sits on the float decision boundary...
        fg = ref_mask[0].astype(bool)
        boundary = fg ^ ndimage.binary_erosion(fg)
        dist = ndimage.distance_transform_edt(~boundary)
        assert np.percentile(dist[dis], 95) <= 1.5, "flips off the boundary"
        # ...at voxels where the float model was itself near-indifferent
        margin = np.abs(logits[..., 1] - logits[..., 0])[0]
        assert (np.median(margin[dis]) < 0.1 * np.median(margin)), (
            "flips at confident voxels")
