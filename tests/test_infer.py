"""Sliding-window inference, detection patch pipeline, metrics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.infer import (FCDMaskGenerator, GridAggregator,
                                              grid_locations,
                                              sliding_window_predict)
from mri_epilepsy_diagnosis_tpu.infer.sliding_window import extract_patches
from mri_epilepsy_diagnosis_tpu.data import patches as P
from mri_epilepsy_diagnosis_tpu.ops import functional as _F


@pytest.fixture(autouse=True, scope="module")
def _fast_precision():
    _F.set_precision_override("fast")
    yield
    _F.set_precision_override(None)


def test_grid_locations_torchio_semantics():
    locs = grid_locations((192, 192, 192), 64, 4)
    axis = sorted(set(l[0] for l in locs))
    assert axis == [0, 60, 120, 128]          # stride 60, final clamped
    assert len(locs) == 4 ** 3
    # volume smaller than patch -> single location
    assert grid_locations((32, 48, 64), 64, 4).tolist() == [[0, 0, 0]]


@pytest.mark.parametrize("mode", ["average", "crop"])
def test_sliding_window_identity_model(mode, rng):
    """With an identity per-patch model, aggregation must reconstruct the
    input volume exactly (both overlap strategies)."""
    vol = jnp.asarray(rng.normal(size=(40, 40, 40, 1)).astype(np.float32))

    def apply_fn(variables, patches):
        return jnp.concatenate([patches, patches], axis=-1)

    out = sliding_window_predict(apply_fn, {}, vol, patch_size=16, overlap=4,
                                 batch_size=8, mode=mode, num_classes=2)
    np.testing.assert_allclose(np.asarray(out)[..., 0],
                               np.asarray(vol)[..., 0], atol=1e-6)


def _torchio_crop_oracle(vol_shape, logits, locations, patch, overlap):
    """Independent numpy statement of torchio GridAggregator
    `overlap_mode='crop'` (the reference's default aggregation,
    `pretraining_3d_unet.ipynb` cells 26/35): crop ``overlap // 2`` from
    every patch face not touching the volume border, then paste the crop
    by ASSIGNMENT in batch order (later patches overwrite earlier ones
    where crops still overlap, e.g. around the clamped final patch)."""
    half = np.broadcast_to(np.asarray(overlap), (3,)) // 2
    out = np.zeros(tuple(vol_shape) + (logits.shape[-1],), logits.dtype)
    for lg, loc in zip(np.asarray(logits), np.asarray(locations)):
        ini = [int(h) if l > 0 else 0 for h, l in zip(half, loc)]
        fin = [int(h) if l + p < s else 0
               for h, l, p, s in zip(half, loc, patch, vol_shape)]
        crop = lg[ini[0]:patch[0] - fin[0], ini[1]:patch[1] - fin[1],
                  ini[2]:patch[2] - fin[2]]
        dst = tuple(slice(l + i, l + p - f)
                    for l, i, p, f in zip(loc, ini, patch, fin))
        out[dst] = crop
    return out


def test_sliding_window_crop_matches_torchio_oracle(rng):
    """The jit 'crop' path must reproduce torchio's GridAggregator crop
    semantics exactly, including overwrite ORDER where cropped regions
    overlap (the clamped final patch).  The apply_fn adds a distinct
    per-patch offset (batch index == grid order with one full-grid call)
    so any ordering or boundary-margin mistake changes voxel values."""
    vol = jnp.asarray(rng.normal(size=(42, 42, 42, 1)).astype(np.float32))
    patch, overlap = (16, 16, 16), 4
    locs = grid_locations(vol.shape[:3], 16, overlap)
    assert sorted(set(l[0] for l in locs)) == [0, 12, 24, 26]  # clamped

    def apply_fn(variables, patches):
        off = jnp.arange(patches.shape[0], dtype=patches.dtype)
        shifted = patches + off[:, None, None, None, None]
        return jnp.concatenate([shifted, -shifted], axis=-1)

    out = sliding_window_predict(apply_fn, {}, vol, patch_size=16,
                                 overlap=overlap, batch_size=len(locs),
                                 mode="crop", num_classes=2)
    patches = np.asarray(extract_patches(vol, locs, patch))
    offs = np.arange(len(locs), dtype=np.float32)[:, None, None, None, None]
    logits = np.concatenate([patches + offs, -(patches + offs)], axis=-1)
    oracle = _torchio_crop_oracle(vol.shape[:3], logits, locs, patch, overlap)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-6)
    # host-side facade: same oracle
    agg = GridAggregator(vol.shape[:3], num_classes=2, overlap_mode="crop",
                         patch_overlap=overlap)
    agg.add_batch(logits, locs)
    np.testing.assert_allclose(agg.get_output_tensor(), oracle, atol=1e-6)


@pytest.mark.parametrize("mode", ["average", "crop"])
def test_sliding_window_agg_impl_parity(mode, rng):
    """'unrolled' (static-index in-place adds, the TPU default), 'scatter'
    (windowed scatter-add) and 'scan' (the torchio GridAggregator
    translation) must produce the same aggregated logits ('crop' always
    routes through the static-unrolled paste — varying crop windows with
    ordered overwrites aren't expressible as scatter/scan)."""
    vol = jnp.asarray(rng.normal(size=(40, 40, 40, 1)).astype(np.float32))

    def apply_fn(variables, patches):
        return jnp.concatenate([patches, -patches], axis=-1)

    kw = dict(patch_size=16, overlap=4, batch_size=8, mode=mode,
              num_classes=2)
    ref = sliding_window_predict(apply_fn, {}, vol, agg="unrolled", **kw)
    for agg in ("scatter", "scan"):
        other = sliding_window_predict(apply_fn, {}, vol, agg=agg, **kw)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(other),
                                   rtol=1e-6, atol=1e-6)


def test_sliding_window_matches_direct_unet(rng):
    from mri_epilepsy_diagnosis_tpu.models import UNet3D

    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    vol = jnp.asarray(rng.normal(size=(16, 16, 16, 1)).astype(np.float32))

    def apply_fn(variables, patch_batch):
        return model.apply(variables, patch_batch)

    # patch == volume -> sliding window must equal the direct forward
    out = sliding_window_predict(apply_fn, v, vol, patch_size=16, overlap=0,
                                 batch_size=1)
    direct = model.apply(v, vol[None])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)


def test_sliding_window_with_packed_apply(rng):
    """The packed execution layout drops into sliding-window inference as
    apply_fn; masks must match the fine path."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2)

    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=3)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    vol = jnp.asarray(rng.normal(size=(24, 24, 24, 1)).astype(np.float32))

    fine = sliding_window_predict(
        lambda v, p: model.apply(v, p), v, vol,
        patch_size=16, overlap=8, batch_size=4)
    packed = sliding_window_predict(
        packed_unet_apply_v2, v, vol,
        patch_size=16, overlap=8, batch_size=4)
    fine_m = np.argmax(np.asarray(fine), -1)
    packed_m = np.argmax(np.asarray(packed), -1)
    assert (fine_m == packed_m).mean() > 0.999


def test_grid_aggregator_host():
    agg = GridAggregator((8, 8, 8), num_classes=1)
    ones = np.ones((2, 4, 4, 4))
    agg.add_batch(ones, np.array([[0, 0, 0], [4, 4, 4]]))
    out = agg.get_output_tensor()
    assert out[0, 0, 0, 0] == 1.0 and out[7, 7, 7, 0] == 1.0
    assert out[0, 7, 0, 0] == 0.0


@pytest.fixture
def synthetic_head():
    """Small 'brain': gmpm gray band + image with a bright lesion."""
    rng = np.random.default_rng(0)
    gmpm = np.zeros((96, 96, 4), np.float32)
    gmpm[10:86, 20:76, :] = 1.0              # gray-matter block
    img = rng.uniform(0.0, 0.2, size=(96, 96, 4)).astype(np.float32)
    img[20:40, 30:60, :] = 0.9               # "lesion"
    mask = np.zeros_like(img, dtype=bool)
    mask[20:40, 30:60, :] = True
    return gmpm, img, mask


def test_patch_extraction_labels(synthetic_head):
    gmpm, img, mask = synthetic_head
    patches, labels = P.get_all_patches_and_labels(img, gmpm, mask)
    assert patches.ndim == 4 and patches.shape[1:] == (2, 16, 32)
    assert labels.dtype == bool and 0 < labels.sum() < len(labels)
    # oversampling adds only positives beyond the base sweep
    base = sum(1 for _ in P.iter_band_patches(img, gmpm, mask))
    assert len(patches) >= base
    assert labels[base:].all()

    only = P.get_only_patches(img, gmpm)
    assert only.shape[0] == base


def test_fcd_mask_generator_end_to_end(synthetic_head):
    gmpm, img, mask = synthetic_head

    def apply_fn(variables, x):
        """Threshold classifier: patch positive iff its first-channel mean is
        bright (B, h, w, 2) -> (B, 2) logits."""
        m = jnp.mean(x[..., 0], axis=(1, 2))
        return jnp.stack([1.0 - m, m], axis=-1)

    gen = FCDMaskGenerator(apply_fn, {}, gmpm, batch_size=64)
    pred = gen.get_mask(img)
    assert pred.shape == img.shape
    assert pred.sum() > 0
    # predicted mask should overlap the lesion far better than chance
    iou = gen.get_iou(pred > 0, mask)
    assert iou > 0.1

    pmt = np.zeros((4, 6, 3), np.int64)
    pmt[1, 3, 1] = 1                          # isolated positive -> erased
    out = FCDMaskGenerator._postprocess(pmt)
    assert out[1, 3, 1] == 0

    pmt2 = np.ones((4, 6, 3), np.int64)
    pmt2[1, 3, 1] = 0                         # isolated negative -> filled
    assert FCDMaskGenerator._postprocess(pmt2)[1, 3, 1] == 1


def test_fcd_inference_pipeline_files(tmp_path, synthetic_head):
    from mri_epilepsy_diagnosis_tpu.utils.nifti import save_nifti, load_nifti

    gmpm, img, mask = synthetic_head
    ip = str(tmp_path / "img.nii.gz")
    mp = str(tmp_path / "mask.nii.gz")
    save_nifti(ip, img)
    save_nifti(mp, mask.astype(np.uint8))

    def apply_fn(variables, x):
        m = jnp.mean(x[..., 0], axis=(1, 2))
        return jnp.stack([1.0 - m, m], axis=-1)

    gen = FCDMaskGenerator(apply_fn, {}, gmpm, batch_size=64)
    out_name = str(tmp_path / "pred.nii.gz")
    pred, iou = gen.inference_pipeline(ip, mp, out_name=out_name)
    assert iou is not None and iou > 0.1
    assert load_nifti(out_name).shape == img.shape
