"""Data layer: NIfTI codec, manifest assembly, dataset semantics."""
import os

import numpy as np
import pandas as pd
import pytest

from conftest import requires_reference

from mri_epilepsy_diagnosis_tpu.utils.nifti import load_nifti, save_nifti
from mri_epilepsy_diagnosis_tpu.utils.data import (
    MriClassification, MriSegmentation, SyntheticVolumes, reshape_image,
    targets_complete)


def test_nifti_roundtrip(tmp_path, rng):
    a = rng.normal(size=(7, 9, 11)).astype(np.float32)
    aff = np.array([[1., 0, 0, -90], [0, 1, 0, -126],
                    [0, 0, 1, -72], [0, 0, 0, 1]])
    p = str(tmp_path / "x.nii.gz")
    save_nifti(p, a, aff)
    img = load_nifti(p)
    np.testing.assert_array_equal(img.data, a)
    np.testing.assert_allclose(img.affine, aff)
    # uncompressed + integer dtype
    p2 = str(tmp_path / "y.nii")
    save_nifti(p2, (a * 100).astype(np.int16))
    np.testing.assert_array_equal(load_nifti(p2).data,
                                  (a * 100).astype(np.int16))


@requires_reference
def test_nifti_reads_mni_template():
    img = load_nifti("/root/reference/detection/MNI152_T1_1mm_brain_gray.nii.gz")
    assert img.shape == (182, 218, 182)       # MNI152 1mm grid
    assert 0.0 <= float(img.data.min()) and float(img.data.max()) <= 1.0
    assert img.affine[0, 0] == -1.0           # radiological x flip


def test_reshape_image_semantics(rng):
    x = rng.normal(size=(50, 52, 54)).astype(np.float32)
    out = reshape_image(x, (10, 10, 10), (32, 32, 32))
    assert out.shape == (1, 32, 32, 32)
    np.testing.assert_array_equal(out[0], x[10:42, 10:42, 10:42])
    with pytest.raises(AssertionError):
        reshape_image(x, (30, 30, 30), (32, 32, 32))


@pytest.fixture
def mini_bank(tmp_path, rng):
    """Tiny on-disk cohort matching the reference's layout conventions."""
    bank = tmp_path / "bank"
    masks = tmp_path / "masks"
    bank.mkdir()
    masks.mkdir()
    rows = []
    for i, (sample, scanner) in enumerate([
            ("pirogov", "siemens"), ("pirogov", "siemens"),
            ("hcp", "ge"), ("la5_study", "philips")]):
        pat = f"sub{i:02d}"
        vol = rng.normal(size=(48, 48, 48)).astype(np.float32)
        seg = rng.choice([0, 2, 17, 1000, 1021, 2030],
                         size=(48, 48, 48)).astype(np.int32)
        if sample == "pirogov":
            save_nifti(str(bank / f"{pat}_norm.nii.gz"), vol)
            save_nifti(str(bank / f"{pat}_aparc+aseg.nii.gz"), seg)
        else:
            save_nifti(str(bank / f"{pat}_T1w_norm.nii.gz"), vol)
            save_nifti(str(bank / f"{pat}_aseg.nii.gz"), seg)
        save_nifti(str(masks / f"{pat}.nii.gz"),
                   (vol > 0.5).astype(np.uint8))
        rows.append(dict(sample=sample, patient=pat, fcd=i % 2, age=30,
                         gender="m", scan=scanner, detection=1, comments=""))
    # one subject with missing image on disk -> must be dropped
    rows.append(dict(sample="hcp", patient="sub99", fcd=1, age=40, gender="f",
                     scan="ge", detection=0, comments=""))
    csv = tmp_path / "targets.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return dict(bank=str(bank), masks=str(masks), csv=str(csv))


def test_targets_complete_join(mini_bank):
    files, le = targets_complete("all", image_path=mini_bank["bank"],
                                 targets_path=mini_bank["csv"])
    assert len(files) == 4                      # sub99 dropped (missing files)
    assert set(files.columns) >= {"patient", "scan", "fcd", "img_file", "img_seg"}
    assert files["scan"].dtype.kind in "iu"     # label-encoded
    assert set(le.classes_) == {"siemens", "ge", "philips"}

    pir, _ = targets_complete("pirogov", image_path=mini_bank["bank"],
                              targets_path=mini_bank["csv"])
    assert len(pir) == 2
    pir_pref, _ = targets_complete("pirogov", prefix="sub00",
                                   image_path=mini_bank["bank"],
                                   targets_path=mini_bank["csv"])
    assert len(pir_pref) == 1


def test_mri_segmentation_modes(mini_bank):
    common = dict(image_path=mini_bank["bank"], targets_path=mini_bank["csv"],
                  coord_min=(8, 8, 8), img_shape=(32, 32, 32))
    ds = MriSegmentation("all", mask="seg", **common)
    img, seg = ds[0]
    assert img.shape == seg.shape == (1, 32, 32, 32)
    # reference binarization: <1000 -> 0, >1000 -> 1 (1000 untouched)
    assert set(np.unique(seg)) <= {0.0, 1.0, 1000.0}

    # NB: with mask_path set, sample must be a concrete cohort — the
    # reference's targets_complete produces an empty manifest for
    # ('all', mask_path) and that quirk is preserved.
    ds_bb = MriSegmentation("pirogov", mask="bb", mask_path=mini_bank["masks"],
                            **common)
    img, bb = ds_bb[0]
    assert set(np.unique(bb)) <= {0.0, 1.0}

    ds_c = MriSegmentation("pirogov", mask="combined",
                           mask_path=mini_bank["masks"], **common)
    _, comb = ds_c[0]
    assert set(np.unique(comb)) <= {0.0, 1.0}
    # combined is an intersection: no voxel on where bb is off
    assert np.all(comb <= bb)


def test_mri_classification(mini_bank):
    ds = MriClassification("all", data_type="img",
                           image_path=mini_bank["bank"],
                           targets_path=mini_bank["csv"],
                           coord_min=(0, 0, 0), img_shape=(48, 48, 48))
    vol, y, scanner = ds[0]
    assert vol.shape == (1, 48, 48, 48) and vol.dtype == np.float32
    assert y in (0, 1) and isinstance(scanner, int)
    assert len(ds) == 4


def test_synthetic_volumes():
    ds = SyntheticVolumes(n=4, img_shape=(16, 16, 16), kind="blobs")
    vol, y, dom = ds[0]
    assert vol.shape == (1, 16, 16, 16)
    seg = ds.as_segmentation()
    img, mask = seg[1]
    assert mask.max() <= 1.0 and img.shape == mask.shape
