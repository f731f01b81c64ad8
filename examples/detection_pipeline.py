"""End-to-end 2D-patch FCD detection.

Script equivalent of the `detection/` notebooks: register a subject to the
MNI152 template (on-device FLIRT+FAST equivalent), extract hemisphere-pair
patches guided by the gray-matter template, train/apply the PatchModel, and
reconstruct a whole-brain mask.

    python examples/detection_pipeline.py --gmpm detection/MNI152_T1_1mm_brain_gray.nii.gz \
        --image subject_T1w.nii.gz [--mask lesion.nii.gz] [--weights ckpt.msgpack]
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.patches import get_image_patches
from mri_epilepsy_diagnosis_tpu.data.pipeline import DataLoader
from mri_epilepsy_diagnosis_tpu.infer.detection import FCDMaskGenerator
from mri_epilepsy_diagnosis_tpu.models import PatchModel
from mri_epilepsy_diagnosis_tpu.train.checkpoint import (load_checkpoint,
                                                         save_checkpoint)
from mri_epilepsy_diagnosis_tpu.train.classification import run_one_epoch, train
from mri_epilepsy_diagnosis_tpu.train.optim import StepLR, torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.utils.nifti import load_nifti


class _PatchDataset:
    def __init__(self, patches, labels):
        # (N, 2, h, w) -> channels-last handled by collate; labels int
        self.patches = patches.astype(np.float32)
        self.target = labels.astype(np.int64)

    def __len__(self):
        return len(self.patches)

    def __getitem__(self, i):
        return (np.moveaxis(self.patches[i], 0, -1), int(self.target[i]), 0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gmpm", required=True,
                   help="MNI152 gray-matter probability template (.nii.gz)")
    p.add_argument("--image", required=True)
    p.add_argument("--mask", default=None, help="lesion mask for training/IoU")
    p.add_argument("--weights", default=None, help="trained PatchModel ckpt")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--out", default="pred_mask.nii.gz")
    args = p.parse_args()

    gmpm = load_nifti(args.gmpm).get_fdata()
    model = PatchModel()
    state = create_train_state(model, torch_adam(3e-4),
                               jnp.zeros((1, 16, 32, 2)))

    if args.weights:
        state = load_checkpoint(args.weights, state)
    elif args.mask:
        # train on this subject's labeled patches (extraction + oversampling)
        patches, labels = get_image_patches(args.image, gmpm, args.mask)
        ds = _PatchDataset(patches, labels)
        loader = DataLoader(ds, batch_size=128, shuffle=True)
        from sklearn.metrics import roc_auc_score
        scheduler = None  # reference uses StepLR(n_epochs//2, 0.1)
        state, *_ = train(state, loader, None, roc_auc_score,
                          max_epoch=args.epochs, verbose=1)
        save_checkpoint("best_model.ckpt", state)

    def apply_fn(variables, x):
        return model.apply(variables, x)

    gen = FCDMaskGenerator(apply_fn, state.variables, gmpm)
    pred, iou = gen.inference_pipeline(args.image, args.mask, out_name=args.out)
    print(f"predicted mask voxels: {int(pred.sum())}  saved to {args.out}")


if __name__ == "__main__":
    main()
