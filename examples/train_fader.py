"""Adversarial fader encoder-classifier-discriminator training.

Script equivalent of `classification/train_ENC_CLF.ipynb`: the exact kwargs
schemas of cell 17, the optimizer/lambda settings of cell 18, per-batch
histogram-standardization collate, and the 3-optimizer alternating loop.

    python examples/train_fader.py --synthetic --epochs 2
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.collate import fader_collate
from mri_epilepsy_diagnosis_tpu.data.pipeline import DataLoader
from mri_epilepsy_diagnosis_tpu.models import Classificator, Discriminator
from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
from mri_epilepsy_diagnosis_tpu.train.fader import FaderState, train_fader
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.utils.data import (MriClassification,
                                                   SyntheticVolumes)

# train_ENC_CLF.ipynb cell 17 schemas
DOWN_BLOCK_KWARGS = dict(conv_k=6, conv_pad=2, conv_s=2, maxpool_k=2,
                         maxpool_s=2, batch_norm=True, act="l_relu")
AE_KWARGS = dict(c_in=1, is_skip=False, deapth=3, c_base=8, inc_size=2,
                 reduce_size=False, down_block_kwargs=DOWN_BLOCK_KWARGS,
                 up_block_kwargs=dict(up="upsample", scale=4,
                                      scale_mode="nearest", conv_k=3,
                                      conv_pad=1, conv_s=1, batch_norm=False,
                                      act="l_relu"))
HEAD_KWARGS = dict(c_in=32, c_out=64, conv_k=3, conv_s=1, conv_pad=0,
                   l_in=64, l_out=32, batch_norm=True, act="relu", p_drop=0.5)
N_DOMAINS = 18


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-path", default="/gpfs/gpfs0/sbi/data/fcd_classification_bank")
    p.add_argument("--targets", default="../targets/targets_fcd_bank.csv")
    p.add_argument("--landmarks", default=None,
                   help="path to trained Nyul landmarks .npy")
    p.add_argument("--epochs", type=int, default=17)
    p.add_argument("--batch-size", type=int, default=35)
    p.add_argument("--disc-loop", type=int, default=3)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision (bf16 activations, f32 master "
                        "weights): 25.4 vs 22.9 vol/s f32 at 192^3 b4 on "
                        "TPU (experiments/aux_bf16_probe.py)")
    p.add_argument("--img-size", type=int, default=192,
                   help="must be 3*4^depth (the heads want a 3^3 latent): "
                        "192, 48, or 12; smaller sizes shrink the encoder "
                        "depth for smoke runs")
    args = p.parse_args()

    size = args.img_size
    depth = {192: 3, 48: 2, 12: 1}.get(size)
    if depth is None:
        raise SystemExit(f"--img-size must be one of 192/48/12, got {size}")

    n_domains = N_DOMAINS
    if args.synthetic:
        # encoder input must reduce 4^depth x to the 3^3 latent the heads
        # expect: 192 crop on real data; smoke runs shrink size and depth
        data = SyntheticVolumes(n=8, img_shape=(size,) * 3, kind="noise",
                                domains=np.arange(8) % 3)
        n_domains = 3
    else:
        data = MriClassification("all", data_type="img",
                                 image_path=args.image_path,
                                 targets_path=args.targets)

    collate = None
    if args.landmarks:
        collate = fader_collate(np.load(args.landmarks))
    loader_kw = dict(batch_size=args.batch_size)
    if collate:
        loader_kw["collate_fn"] = collate
    train_loader = DataLoader(data, shuffle=True, **loader_kw)
    val_loader = DataLoader(data, **loader_kw)

    ae_kwargs = dict(AE_KWARGS, deapth=depth)
    head_kwargs = dict(HEAD_KWARGS)
    if depth != 3:  # scale the heads to the shrunken latent channel count
        c_latent = ae_kwargs["c_base"] * 2 ** (depth - 1)
        head_kwargs.update(c_in=c_latent, c_out=2 * c_latent,
                           l_in=2 * c_latent, l_out=c_latent)

    encoder = make_encoder(ae_kwargs)
    clf = Classificator(n_class=2, **head_kwargs)
    disc = Discriminator(n_domains=n_domains, **head_kwargs)

    key = jax.random.key(0)
    x0 = jnp.zeros((1, size, size, size, 1))
    enc_state = create_train_state(
        encoder, torch_adam(7e-4, betas=(0.9, 0.999), weight_decay=1e-4), x0, key)
    latent0, _ = encoder.apply(enc_state.variables, x0)
    clf_state = create_train_state(
        clf, torch_adam(7e-4, betas=(0.9, 0.999), weight_decay=1e-4), latent0, key)
    disc_state = create_train_state(
        disc, torch_adam(5e-4, betas=(0.9, 0.999), weight_decay=1e-4), latent0, key)
    fstate = FaderState(encoder=enc_state, clf=clf_state, disc=disc_state)

    # cell 18: lambda 1e-4 -> 1e-1 over 300 steps; weighted CE
    class_weight = [1.0, 2.0]
    fstate, hist = train_fader(
        fstate, train_loader, val_loader, epochs=args.epochs,
        lambda_initial=1e-4, lambda_step=(1e-1 - 1e-4) / 300, max_step=300,
        n_domains=n_domains, disc_loop=args.disc_loop,
        class_weight=class_weight,
        input_dtype=jnp.bfloat16 if args.bf16 else None)
    print("final val accuracy:", hist["acc"][-1] if hist["acc"] else None)


if __name__ == "__main__":
    main()
