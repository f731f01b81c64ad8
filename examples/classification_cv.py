"""Whole-volume classification with k-fold cross validation.

Script equivalent of `classification/baseline/baseline_sample_classification.ipynb`
(DilatedCNN baseline) and `classification/transfer/full_sample_classification.ipynb`
(VoxResNet transfer): stratified CV, Adam + ReduceLROnPlateau, ROC-AUC.

    python examples/classification_cv.py --synthetic --model voxresnet
"""
import argparse

import numpy as np
from sklearn.metrics import roc_auc_score
from sklearn.model_selection import StratifiedKFold

import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.models import DilatedCNN, VoxResNet
from mri_epilepsy_diagnosis_tpu.train.classification import cross_val_score
from mri_epilepsy_diagnosis_tpu.utils.data import (MriClassification,
                                                   SyntheticVolumes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-path", default="/gpfs/gpfs0/sbi/data/fcd_classification_bank")
    p.add_argument("--targets", default="../targets/targets_fcd_bank.csv")
    p.add_argument("--sample", default="soloviev")
    p.add_argument("--model", default="dilated", choices=["dilated", "voxresnet"])
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--max-epoch", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--img-size", type=int, default=180)
    p.add_argument("--transfer-from", default=None,
                   help=".pth or .ckpt to transfer from (freeze body, new head)")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    size = 32 if args.synthetic else args.img_size
    if args.synthetic:
        data = SyntheticVolumes(n=16, img_shape=(size,) * 3, kind="noise")
        args.folds, args.max_epoch, args.lr = 2, 2, 1e-3
    else:
        data = MriClassification(args.sample, data_type="img",
                                 image_path=args.image_path,
                                 targets_path=args.targets,
                                 img_shape=(size,) * 3)

    if args.model == "dilated":
        # the reference DilatedCNN's flatten formula ((s-61)//16 - 5)^3
        # requires s >= 157 — reject sizes its geometry can't support
        if (size - 61) // 16 - 5 < 1:
            raise SystemExit(
                f"DilatedCNN needs --img-size >= 157 (got {size}); "
                "use --model voxresnet for small smoke runs")
        model = DilatedCNN(input_shape=(size,) * 3,
                           n_channels=4 if args.synthetic else 32)
    else:
        model = VoxResNet(input_shape=(size,) * 3,
                          n_filters=4 if args.synthetic else 32,
                          stride=1 if args.synthetic else 2)

    sample = jnp.zeros((1, size, size, size, 1))
    scores = cross_val_score(
        model, data, StratifiedKFold(args.folds), roc_auc_score, sample,
        batch_size=args.batch_size, max_epoch=args.max_epoch, lr=args.lr,
        model_load_path=args.transfer_from,
        transfer=args.transfer_from is not None)
    scores = [s for s in scores if s is not None]
    print(f"CV ROC-AUC: {np.mean(scores):.3f} +- {np.std(scores):.3f}  {scores}")


if __name__ == "__main__":
    main()
