"""End-to-end preprocessing pipelines.

`register_img_and_mask` / `register_img` are the on-device equivalents of
the reference's FSL shell-out pipeline (`detection/preprocessing_utils.py`:
FLIRT affine registration to the MNI152 template, `.mat` reuse to carry the
lesion mask along, FAST bias-field correction) — one jit'd graph instead of
three subprocess invocations per subject.

`preprocess_volume` is the composed intensity graph used before training /
inference: optional histogram standardization -> z-normalization ->
crop-or-pad (the Compose([...]) of `pretraining_3d_unet.ipynb` cell 9).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.nifti import NiftiImage
from .intensity import histogram_standardization, znormalization
from .registration import apply_transform, bias_field_correction, register_affine
from .spatial import crop_or_pad, world_affine_to_voxel


def register_img(img: NiftiImage, template: NiftiImage, *,
                 dof: int = 12, bias_correct: bool = True,
                 levels=(4, 2, 1), iters=(200, 100, 50)):
    """FLIRT+FAST equivalent for control volumes
    (`detection/preprocessing_utils.py:56-73`).

    Returns (registered volume on the template grid, bias-corrected volume,
    voxel-space affine for reuse)."""
    # initialize from the NIfTI world affines, refine with NCC optimization
    init_vox = world_affine_to_voxel(img.affine, template.affine)
    moving = apply_transform(np.asarray(img.data, np.float32), init_vox,
                             template.shape)
    affine, warped = register_affine(np.asarray(moving),
                                     np.asarray(template.data, np.float32),
                                     dof=dof, levels=levels, iters=iters)
    corrected = warped
    if bias_correct:
        corrected, _ = bias_field_correction(warped)
    total_affine = np.asarray(init_vox) @ np.asarray(affine)
    return warped, corrected, total_affine


def register_img_and_mask(img: NiftiImage, template: NiftiImage,
                          mask: Optional[NiftiImage] = None, **kwargs):
    """FLIRT+mask-transform+FAST equivalent for patient volumes
    (`detection/preprocessing_utils.py:11-53`): register the image, then
    re-apply the same transform to the lesion mask (the `.mat`-reuse /
    `apply_xfm` workflow)."""
    warped, corrected, affine = register_img(img, template, **kwargs)
    warped_mask = None
    if mask is not None:
        warped_mask = apply_transform(
            np.asarray(mask.data, np.float32), affine, template.shape)
        warped_mask = (np.asarray(warped_mask) > 0.5).astype(np.float32)
    return warped, corrected, warped_mask, affine


def preprocess_volume(vol, landmarks=None, target_shape: Tuple[int, ...] = None,
                      masking_method: Optional[str] = None):
    """Jit-friendly intensity graph: [hist-std] -> znorm -> [crop-or-pad]."""
    x = jnp.asarray(vol, jnp.float32)
    if landmarks is not None:
        x = histogram_standardization(x, landmarks)
    x = znormalization(x, masking_method=masking_method)
    if target_shape is not None:
        x = crop_or_pad(x, target_shape)
    return x
