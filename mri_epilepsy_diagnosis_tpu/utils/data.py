"""Dataset manifest assembly and MRI dataset classes.

Capability-parity with the reference's `utils/data.py`:

- `reshape_image` / `load_nii_to_array`         (`utils/data.py:16-41`)
- `targets_complete` manifest join              (`utils/data.py:44-118`):
  filter `targets_fcd_bank.csv` by cohort (pirogov/kulakov/hcp/la5_study/
  soloviev or 'all'), glob `*norm*` T1 and `*aseg*` FreeSurfer parcellations,
  optional lesion-mask dir, drop incomplete subjects, LabelEncode scanner ids.
- `MriSegmentation` (mask modes 'seg'/'bb'/'combined', `utils/data.py:121-200`)
- `MriClassification` (data_type 'img'/'seg', `utils/data.py:203-257`)

Framework-native differences: items are numpy float32 arrays (channel-first
`(1, D, H, W)`, exactly the reference's tensor layout) instead of torch
tensors; datasets are plain indexable objects consumed by `data.pipeline`
loaders which batch to channels-last device arrays.

`SyntheticVolumes` formalizes the reference's synthetic-data smoke fixture
(`train_AE.ipynb` cell 3: `np.ones((6,1,192,192,192))`).
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.preprocessing import LabelEncoder

from .nifti import load_nifti

# FreeSurfer subcortical ids binarized into the segmentation target
# (reference `segmentation/routine.py:70-71`).
LIST_FCD = [8, 10, 11, 12, 13, 16, 17, 18, 26, 47, 49, 50,
            51, 52, 53, 54, 58, 85, 251, 252, 253, 254, 255]


def reshape_image(img: np.ndarray, coord_min, img_shape) -> np.ndarray:
    """Fixed-offset crop to `img_shape`, then add a leading channel dim."""
    img = img[coord_min[0]:coord_min[0] + img_shape[0],
              coord_min[1]:coord_min[1] + img_shape[1],
              coord_min[2]:coord_min[2] + img_shape[2]]
    if tuple(img.shape[:3]) != tuple(img_shape):
        raise AssertionError(
            f"Current image shape {img.shape[:3]} != desired {tuple(img_shape)}")
    return img.reshape((1,) + tuple(img_shape))


def load_nii_to_array(nii_path: str):
    """Reference-compatible loader: returns '' on missing/inaccessible file."""
    try:
        return np.asanyarray(load_nifti(nii_path).data)
    except OSError:
        print(FileNotFoundError(f"No such file or no access: '{nii_path}'"))
        return ""


def targets_complete(sample: str,
                     prefix=False,
                     mask_path=False,
                     image_path: str = "/gpfs/gpfs0/sbi/data/fcd_classification_bank",
                     targets_path: str = "../targets/targets_fcd_bank.csv",
                     ignore_missing: bool = True,
                     data_type=False) -> Tuple[pd.DataFrame, LabelEncoder]:
    """Join the targets CSV with files on disk.

    Matching rules preserved from the reference: cohort 'pirogov' matches by
    exact filename (`<patient>_norm.nii.gz`, `<patient>_aparc+aseg.nii[.gz]`);
    other cohorts match by patient-id substring.  Masks match
    `<patient>.nii.gz` under `mask_path`.
    """
    targets = pd.read_csv(targets_path)
    files = pd.DataFrame(
        columns=["patient", "scan", "fcd", "img_file", "img_seg"])
    if sample == "all" and not mask_path:
        clause = pd.Series(True, index=targets.index)
    else:
        clause = targets["sample"] == sample
        if prefix:
            clause &= targets["patient"].str.startswith(prefix)
    for col in ["patient", "fcd", "scan", "detection", "comments"]:
        files[col] = targets[col][clause].copy()
    files["img_file"] = pd.Series(pd.NA, index=files.index, dtype="object")
    files["img_seg"] = pd.Series(pd.NA, index=files.index, dtype="object")
    if mask_path:
        files["img_mask"] = pd.Series(pd.NA, index=files.index, dtype="object")

    norm_files = sorted(glob.glob(os.path.join(image_path, "*norm*")))
    aseg_files = sorted(glob.glob(os.path.join(image_path, "*aseg*")))
    mask_files = (sorted(glob.glob(os.path.join(mask_path, "*.nii*")))
                  if mask_path else [])

    for i in files.index:
        patient = files.at[i, "patient"]
        for f in norm_files:
            base = os.path.basename(f)
            if sample == "pirogov":
                if base == f"{patient}_norm.nii.gz":
                    files.at[i, "img_file"] = f
            elif patient in f:
                files.at[i, "img_file"] = f
        for f in aseg_files:
            base = os.path.basename(f)
            if sample == "pirogov":
                if base in (f"{patient}_aparc+aseg.nii.gz",
                            f"{patient}_aparc+aseg.nii"):
                    files.at[i, "img_seg"] = f
            elif patient in f:
                files.at[i, "img_seg"] = f
        for f in mask_files:
            if os.path.basename(f) == f"{patient}.nii.gz":
                files.at[i, "img_mask"] = f

    if ignore_missing:
        if data_type == "img":
            files = files.dropna(subset=["img_file"])
        elif data_type == "seg":
            files = files.dropna(subset=["img_seg"])
        else:
            files = files.dropna(subset=["img_seg", "img_file"])

    files = files.reset_index(drop=True)
    le = LabelEncoder()
    files["scan"] = le.fit_transform(files["scan"])
    return files, le


class _MriDatasetBase:
    def __init__(self, sample, prefix, mask_path, image_path, targets_path,
                 ignore_missing, coord_min, img_shape, data_type=False):
        print("Assembling data for: ", sample, " sample.")
        files, le = targets_complete(sample, prefix, mask_path, image_path,
                                     targets_path, ignore_missing, data_type)
        self.img_files = files["img_file"]
        self.img_seg = files["img_seg"]
        self.scan = files["scan"]
        self.scan_keys = le.classes_
        self.target = files["fcd"]
        self.detection = files["detection"]
        self.misc = files["comments"]
        if mask_path:
            self.img_mask = files["img_mask"]
        self.coord_min = tuple(coord_min)
        self.img_shape = tuple(img_shape)
        self.mask_path = mask_path

    def __len__(self):
        return len(self.img_files)


class MriSegmentation(_MriDatasetBase):
    """(image, mask) pairs.  mask in {'seg','bb','combined'}:
    'seg'      — binarized cortical structures from aseg+aparc (labels > 1000)
    'bb'       — lesion bounding-box masks from `mask_path`
    'combined' — logical AND of both.
    """

    def __init__(self, sample, prefix=False, mask_path=False,
                 image_path="/gpfs/gpfs0/sbi/data/fcd_classification_bank",
                 targets_path="../targets/targets_fcd_bank.csv",
                 ignore_missing=True, coord_min=(30, 30, 30),
                 img_shape=(192, 192, 192), mask="seg"):
        assert mask in ["seg", "bb", "combined"], "Invalid mask name!"
        super().__init__(sample, prefix, mask_path, image_path, targets_path,
                         ignore_missing, coord_min, img_shape)
        self.mask = mask

    @staticmethod
    def binarize_cortex(seg: np.ndarray) -> np.ndarray:
        """Reference binarization (`utils/data.py:173-176`): <1000 -> 0,
        >1000 -> 1 (exactly 1000, 'ctx-lh-unknown', is left untouched —
        bug-compatible)."""
        seg = seg.copy()
        seg[seg < 1000] = 0
        seg[seg > 1000] = 1
        return seg

    def __getitem__(self, index):
        img = reshape_image(load_nii_to_array(self.img_files[index]),
                            self.coord_min, self.img_shape).astype(np.float32)
        seg = reshape_image(load_nii_to_array(self.img_seg[index]),
                            self.coord_min, self.img_shape).astype(np.float32)
        if self.mask == "seg":
            return img, self.binarize_cortex(seg)
        mask = reshape_image(load_nii_to_array(self.img_mask[index]),
                             self.coord_min, self.img_shape).astype(np.float32)
        if self.mask == "bb":
            return img, mask
        comb = np.logical_and(mask, self.binarize_cortex(seg))
        return img, comb.astype(np.float32)


class MriClassification(_MriDatasetBase):
    """(volume, fcd-label, scanner-id) triples; data_type 'img' or 'seg'."""

    def __init__(self, sample, prefix=False, mask_path=False,
                 image_path="/gpfs/gpfs0/sbi/data/fcd_classification_bank",
                 targets_path="../targets/targets_fcd_bank.csv",
                 ignore_missing=True, coord_min=(30, 30, 30),
                 img_shape=(192, 192, 192), data_type="seg"):
        assert data_type in ["seg", "img"], "Invalid file format!"
        super().__init__(sample, prefix, mask_path, image_path, targets_path,
                         ignore_missing, coord_min, img_shape, data_type)
        self.data_type = data_type

    def __getitem__(self, index):
        if self.data_type == "img":
            arr = load_nii_to_array(self.img_files[index])
        else:
            arr = load_nii_to_array(self.img_seg[index])
        vol = reshape_image(arr, self.coord_min, self.img_shape).astype(np.float32)
        return vol, int(self.target[index]), int(self.scan[index])


class SyntheticVolumes:
    """In-memory synthetic dataset (the reference's `np.ones((N,1,192^3))`
    smoke fixture, `train_AE.ipynb` cell 3) with optional labels/domains."""

    def __init__(self, n: int = 6, img_shape=(192, 192, 192),
                 targets: Optional[Sequence[int]] = None,
                 domains: Optional[Sequence[int]] = None,
                 kind: str = "ones", seed: int = 0):
        self.img_shape = tuple(img_shape)
        rng = np.random.default_rng(seed)
        if kind == "ones":
            self.volumes = np.ones((n, 1) + self.img_shape, np.float32)
        elif kind == "noise":
            self.volumes = rng.normal(
                size=(n, 1) + self.img_shape).astype(np.float32)
        elif kind == "blobs":
            vols = []
            for _ in range(n):
                g = np.mgrid[tuple(slice(0, s) for s in self.img_shape)]
                c = [rng.uniform(0.3, 0.7) * s for s in self.img_shape]
                r = [rng.uniform(0.2, 0.4) * s for s in self.img_shape]
                r2 = sum(((g[i] - c[i]) / r[i]) ** 2 for i in range(3))
                vols.append((r2 < 1.0).astype(np.float32)[None] * 100.0)
            self.volumes = np.stack(vols)
        else:
            raise ValueError(kind)
        self.target = pd.Series(
            np.asarray(targets if targets is not None else rng.integers(0, 2, n)))
        self.scan = pd.Series(
            np.asarray(domains if domains is not None else rng.integers(0, 3, n)))
        self.scan_keys = np.unique(self.scan)

    def __len__(self):
        return len(self.volumes)

    def __getitem__(self, index):
        return (self.volumes[index], int(self.target[index]),
                int(self.scan[index]))

    def as_segmentation(self, threshold: float = 50.0):
        """(img, mask) view: mask = volume > threshold."""
        return _SyntheticSeg(self, threshold)


class _SyntheticSeg:
    def __init__(self, base: SyntheticVolumes, threshold: float):
        self.base = base
        self.threshold = threshold
        self.target = base.target
        self.scan = base.scan

    def __len__(self):
        return len(self.base)

    def __getitem__(self, index):
        img = self.base.volumes[index]
        return img, (img > self.threshold).astype(np.float32)
