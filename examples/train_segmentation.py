"""Whole-volume 3D U-Net segmentation training.

Script equivalent of the reference's `segmentation/pretraining_3d_unet.ipynb`
/ `baseline_3d_unet.ipynb` driver notebooks: manifest -> loaders -> UNet ->
dice-loss training -> per-epoch checkpoints -> surface-metric validation.

Run on real data:
    python examples/train_segmentation.py --image-path /data/bank \
        --targets /data/targets_fcd_bank.csv --sample all --epochs 12
Run the synthetic smoke slice (no data needed):
    python examples/train_segmentation.py --synthetic --epochs 2
"""
import argparse

import numpy as np

import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.pipeline import DataLoader, PatchQueue
from mri_epilepsy_diagnosis_tpu.obs.logger import Experiment
from mri_epilepsy_diagnosis_tpu.train.seg import (get_model_and_optimizer,
                                                  train_segmentation,
                                                  validate_dsc_asd)
from mri_epilepsy_diagnosis_tpu.utils.data import (MriSegmentation,
                                                   SyntheticVolumes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-path", default="/gpfs/gpfs0/sbi/data/fcd_classification_bank")
    p.add_argument("--targets", default="../targets/targets_fcd_bank.csv")
    p.add_argument("--sample", default="all")
    p.add_argument("--mask", default="seg", choices=["seg", "bb", "combined"])
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--ocfl", type=int, default=16,
                   help="out_channels_first_layer (reference uses 16 or 8)")
    p.add_argument("--img-size", type=int, default=192)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--patches", action="store_true",
                   help="train on random 64^3 patches (torchio Queue mode)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--packed", action="store_true",
                   help="train in the packed (space-to-depth) execution "
                        "layout — required for 192^3 whole volumes on this "
                        "platform and ~3x faster (UNet nb=3)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 activations, f32 "
                        "master weights/optimizer/BN stats (~1.5x the f32 "
                        "192^3 step rate; needs --packed)")
    p.add_argument("--resilient", action="store_true",
                   help="auto-resume + NaN rollback + preemption-safe "
                        "checkpointing (train/resilience.py)")
    p.add_argument("--weights-stem", default="whole_im_train")
    args = p.parse_args()

    if args.synthetic:
        size = min(args.img_size, 64)
        data = SyntheticVolumes(n=8, img_shape=(size,) * 3,
                                kind="blobs").as_segmentation()
        train_set, val_set = data, data
    else:
        data = MriSegmentation(args.sample, image_path=args.image_path,
                               targets_path=args.targets, mask=args.mask,
                               img_shape=(args.img_size,) * 3)
        idx = np.random.default_rng(0).permutation(len(data))
        cut = max(1, int(0.9 * len(data)))
        from mri_epilepsy_diagnosis_tpu.data.pipeline import Subset
        train_set, val_set = Subset(data, idx[:cut]), Subset(data, idx[cut:])

    if args.patches:
        from mri_epilepsy_diagnosis_tpu.data import batched
        queue = PatchQueue(train_set, samples_per_volume=6,
                           patch_size=64, max_length=180, num_workers=2)
        train_loader = batched(queue, batch_size=16)
        val_loader = DataLoader(val_set, batch_size=1)
    else:
        train_loader = DataLoader(train_set, batch_size=args.batch_size)
        val_loader = DataLoader(val_set, batch_size=args.batch_size)

    sample = jnp.zeros((1, 16, 16, 16, 1))
    model, state, scheduler = get_model_and_optimizer(
        sample, out_channels_first_layer=args.ocfl)
    experiment = Experiment(project_name="segmentation")

    # f32 whole-volume batches >= 2 only compile with per-block remat; the
    # bf16 flat graph compiles at b2 and beats remat by ~17%
    # (experiments/train_bf16_b4_remat_probe.py: 5.28 vs 4.41 vol/s)
    packed_mode = args.packed
    if (args.packed and not args.patches and args.batch_size >= 2
            and not args.bf16):
        packed_mode = "remat"
    input_dtype = jnp.bfloat16 if args.bf16 else None
    if args.bf16 and not args.packed:
        raise SystemExit("--bf16 requires --packed (the fine-layout bf16 "
                         "graph is untested on this platform's compiler)")

    if args.resilient:
        from mri_epilepsy_diagnosis_tpu.train.resilience import (
            CheckpointManager, train_segmentation_resilient)
        manager = CheckpointManager("weights", stem=args.weights_stem)
        state, train_losses, val_losses, _ = train_segmentation_resilient(
            args.epochs, train_loader, val_loader, state, scheduler,
            manager, experiment=experiment, packed=packed_mode,
            input_dtype=input_dtype)
    else:
        state, train_losses, val_losses = train_segmentation(
            args.epochs, train_loader, val_loader, state, scheduler,
            args.weights_stem, experiment=experiment, packed=packed_mode,
            input_dtype=input_dtype)

    dsc, asd_mean, _, iou = validate_dsc_asd(state, val_loader,
                                             packed=packed_mode)
    print(f"mean DSC {np.nanmean(dsc):.4f}  mean ASD {np.nanmean(asd_mean):.4f}"
          f"  mean IoU {np.mean(iou):.4f}")


if __name__ == "__main__":
    main()
