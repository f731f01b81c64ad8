"""Checkpoint-sweep validation: port every shipped `.pth` and score it.

Script equivalent of `segmentation/results_validation.ipynb` (cells 8-9: load
checkpoints, recompute per-subject DSC/ASD/IoU) and the per-epoch sweep of
`segmentation/pretraining_3d_unet.ipynb` cell 17 — one driver that imports
each PyTorch checkpoint in a directory, runs whole-volume validation (packed
execution layout by default) and prints the report table.

    # sweep the reference's shipped weights against real subjects
    python examples/validate_checkpoints.py \
        --pth-dir /root/reference/segmentation/weights --ocfl 8 \
        --image subj_norm.nii.gz --seg subj_aparc+aseg.nii.gz

    # smoke-run on synthetic blob volumes (no MRI bank needed)
    python examples/validate_checkpoints.py --synthetic --img-size 16 --ocfl 4
"""
import argparse
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.pipeline import DataLoader
from mri_epilepsy_diagnosis_tpu.interop import import_torch_state_dict
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import validate_dsc_asd
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.transforms import znormalization
from mri_epilepsy_diagnosis_tpu.utils.data import SyntheticVolumes, reshape_image
from mri_epilepsy_diagnosis_tpu.utils.nifti import load_nifti


def _nifti_loader(images, segs, img_size, coord_min, batch_size):
    """(img, raw-seg) batches from NIfTI pairs, reference crop + z-norm."""
    shape = (img_size,) * 3
    pairs = []
    for im, sg in zip(images, segs):
        vol = reshape_image(np.asarray(load_nifti(im).data), coord_min, shape)
        x = np.asarray(znormalization(jnp.asarray(vol[0], jnp.float32)))
        seg = reshape_image(np.asarray(load_nifti(sg).data), coord_min,
                            shape)[0]
        pairs.append((x[..., None], seg[..., None].astype(np.float32)))
    for i in range(0, len(pairs), batch_size):
        chunk = pairs[i:i + batch_size]
        yield (np.stack([c[0] for c in chunk]),
               np.stack([c[1] for c in chunk]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth-dir", default="/root/reference/segmentation/weights")
    p.add_argument("--pattern", default="*.pth")
    p.add_argument("--ocfl", type=int, default=8)
    p.add_argument("--img-size", type=int, default=192)
    p.add_argument("--coord-min", type=int, nargs=3, default=(30, 30, 30))
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--image", action="append", default=[],
                   help="T1 NIfTI (repeatable; pairs with --seg)")
    p.add_argument("--seg", action="append", default=[],
                   help="aseg+aparc ground-truth NIfTI (repeatable)")
    p.add_argument("--synthetic", action="store_true",
                   help="score against synthetic blob volumes (smoke mode; "
                        "also used when no --image/--seg pairs are given)")
    p.add_argument("--n-synthetic", type=int, default=4)
    p.add_argument("--fine", action="store_true",
                   help="fine-layout forward instead of packed (3x slower)")
    args = p.parse_args()

    model = UNet3D(out_channels_first_layer=args.ocfl)
    state = create_train_state(model, torch_adamw(),
                               jnp.zeros((1, 8, 8, 8, 1)))

    paths = sorted(glob.glob(os.path.join(args.pth_dir, args.pattern)))
    if not paths:
        raise SystemExit(f"no checkpoints match {args.pth_dir}/{args.pattern}")

    def make_loader():
        if args.image and not args.synthetic:
            if len(args.image) != len(args.seg):
                raise SystemExit("--image/--seg must come in pairs")
            return _nifti_loader(args.image, args.seg, args.img_size,
                                 args.coord_min, args.batch_size)
        data = SyntheticVolumes(
            n=args.n_synthetic, img_shape=(args.img_size,) * 3,
            kind="blobs").as_segmentation()
        # samples stay (C,D,H,W) — default_collate moves channels last;
        # raw labels >1000 binarize to 1 (reference aparc rule): scale masks
        return DataLoader(data, batch_size=args.batch_size,
                          transform=lambda s: (s[0], s[1] * 2000.0))

    packed = not args.fine and args.img_size % 8 == 0
    print(f"{'checkpoint':52s} {'DSC':>7s} {'ASD':>7s} {'IoU':>7s}")
    results = {}
    for path in paths:
        try:
            variables = import_torch_state_dict(state.variables, path)
        except Exception as e:  # non-UNet .pth in the dir: soft-skip
            print(f"{os.path.basename(path):52s} skipped "
                  f"({type(e).__name__})")
            continue
        st = state.replace(params=variables["params"],
                           batch_stats=variables.get("batch_stats"))
        dsc, asd_mean, _, iou = validate_dsc_asd(st, make_loader(),
                                                 packed=packed)
        row = (float(np.nanmean(dsc)), float(np.nanmean(asd_mean)),
               float(np.mean(iou)))
        results[path] = row
        print(f"{os.path.basename(path):52s} {row[0]:7.4f} {row[1]:7.4f} "
              f"{row[2]:7.4f}")

    if results:
        best = max(results, key=lambda k: results[k][0])
        print(f"best: {os.path.basename(best)} "
              f"(DSC {results[best][0]:.4f})")


if __name__ == "__main__":
    main()
