from .nifti import NiftiImage, load_nifti, save_nifti
from .data import (load_nii_to_array, reshape_image, targets_complete,
                   MriSegmentation, MriClassification, SyntheticVolumes,
                   LIST_FCD)

__all__ = [
    "NiftiImage", "load_nifti", "save_nifti",
    "load_nii_to_array", "reshape_image", "targets_complete",
    "MriSegmentation", "MriClassification", "SyntheticVolumes", "LIST_FCD",
]
