"""Whole-brain segmentation inference from a ported PyTorch checkpoint.

Script equivalent of `segmentation/results_validation.ipynb`: port a shipped
`.pth`, run whole-volume (or sliding-window) inference, report DSC/ASD/IoU
against the FreeSurfer-derived ground truth, save the predicted mask.

    python examples/infer_whole_brain.py --pth whole_im_train_seg_parc_epoch_7.pth \
        --image subj_norm.nii.gz --seg subj_aparc+aseg.nii.gz --ocfl 8
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.interop import import_torch_state_dict
from mri_epilepsy_diagnosis_tpu.infer import sliding_window_predict
from mri_epilepsy_diagnosis_tpu.metrics import (
    compute_average_surface_distance, compute_dice_coefficient,
    compute_surface_distances, get_iou_score)
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.transforms import (binarize_segmentation,
                                                   znormalization)
from mri_epilepsy_diagnosis_tpu.utils.data import reshape_image
from mri_epilepsy_diagnosis_tpu.utils.nifti import load_nifti, save_nifti


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--seg", default=None, help="aseg+aparc ground truth")
    p.add_argument("--ocfl", type=int, default=8)
    p.add_argument("--img-size", type=int, default=192)
    p.add_argument("--coord-min", type=int, nargs=3, default=(30, 30, 30))
    p.add_argument("--sliding-window", action="store_true",
                   help="64^3 patches with overlap 4 instead of whole volume")
    p.add_argument("--fine", action="store_true",
                   help="use the fine channels-last forward instead of the "
                        "default packed execution layout (3x slower on TPU; "
                        "identical masks)")
    p.add_argument("--out", default="pred_mask.nii.gz")
    args = p.parse_args()

    model = UNet3D(out_channels_first_layer=args.ocfl)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    variables = import_torch_state_dict(variables, args.pth)

    img_nii = load_nifti(args.image)
    shape = (args.img_size,) * 3
    vol = reshape_image(np.asarray(img_nii.data), args.coord_min, shape)
    x = znormalization(jnp.asarray(vol[0], jnp.float32))[..., None]

    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2, packed_unet_mask_v2)

    # the packed layout needs sizes divisible by 2^num_encoding_blocks;
    # fall back to the fine path for e.g. --img-size 180
    use_packed = not args.fine and args.img_size % 8 == 0
    apply_fn = (packed_unet_apply_v2 if use_packed
                else (lambda v, b: model.apply(v, b)))
    if use_packed:
        # bake eval-BN into the conv weights — exact, ~2% faster, smaller
        # graph (experiments/bn_fold_ab.py); packed entry points skip BN
        # when the key is absent (the fine model.apply path needs it live)
        from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
            fold_bn_inference)
        variables = fold_bn_inference(variables)
    if args.sliding_window:
        # batch 64 = the whole 192^3 grid in one model call; 'unrolled'
        # static aggregation (both defaults) — 14.3 vs 8.4 vol/s for the
        # b16-chunked scan (experiments/sliding_window_batch_ab.py)
        logits = sliding_window_predict(apply_fn, variables, x,
                                        patch_size=64, overlap=4)
        pred = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.uint8)
    elif use_packed:
        # packed-space mask epilogue: skips the fine-logit argmax
        # (experiments/mask_epilogue_ab.py); variables already BN-folded
        pred = np.asarray(
            jax.jit(packed_unet_mask_v2)(variables, x[None])[0]
        ).astype(np.uint8)
    else:
        logits = jax.jit(apply_fn)(variables, x[None])[0]
        pred = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.uint8)
    save_nifti(args.out, pred, img_nii.affine)
    print(f"saved {args.out}: {int(pred.sum())} foreground voxels")

    if args.seg:
        seg = reshape_image(np.asarray(load_nifti(args.seg).data),
                            args.coord_min, shape)[0]
        gt = np.asarray(binarize_segmentation(jnp.asarray(seg))).astype(np.uint8)
        sd = compute_surface_distances(gt, pred, (1, 1, 1))
        asd = compute_average_surface_distance(sd)
        print(f"DSC {compute_dice_coefficient(gt, pred):.4f}  "
              f"ASD {asd[0]:.4f}/{asd[1]:.4f}  IoU {get_iou_score(pred, gt):.4f}")


if __name__ == "__main__":
    main()
