"""Fader autoencoder pretraining (MSE reconstruction + adversarial domain
loss) — script equivalent of `classification/train_AE.ipynb`, including its
synthetic `np.ones((6,1,192,192,192))` smoke fixture (cell 3) and the cell-8
kwargs schemas.

    python examples/train_ae.py --synthetic --epochs 1
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.pipeline import DataLoader
from mri_epilepsy_diagnosis_tpu.models import AE, Discriminator
from mri_epilepsy_diagnosis_tpu.train.fader import FaderState, ae_step, disc_step
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.utils.data import SyntheticVolumes

# train_AE.ipynb cell 8 schemas
DOWN_BLOCK_KWARGS = dict(conv_k=3, conv_pad=1, conv_s=1, maxpool_k=2,
                         maxpool_s=2, batch_norm=True, act="relu")
UP_BLOCK_KWARGS = dict(up="upsample", scale=2, scale_mode="nearest", conv_k=3,
                       conv_pad=1, conv_s=1, batch_norm=True, act="relu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--c-base", type=int, default=16)
    p.add_argument("--img-size", type=int, default=192)
    p.add_argument("--disc-loop", type=int, default=1)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: bf16 activations, f32 master "
                        "weights — 28.4 vs 27.4 vol/s f32 at 128^3 b2 on "
                        "TPU (experiments/aux_bf16_probe.py)")
    args = p.parse_args()

    if args.synthetic:
        # geometry mirrors the notebook's 192^3/depth-6 run (latent reduces
        # to 1^3 inside the discriminator): 16^3 at depth 3 -> 2^3 latent
        args.img_size, args.depth, args.c_base = 16, 3, 4
        data = SyntheticVolumes(n=6, img_shape=(args.img_size,) * 3,
                                kind="ones", domains=[1, 2, 0, 2, 0, 1])
        n_domains = 3
    else:
        raise SystemExit("wire a MriClassification dataset here for real data")

    ae_kwargs = dict(c_in=1, is_skip=False, deapth=args.depth,
                     c_base=args.c_base, inc_size=2, reduce_size=False,
                     down_block_kwargs=DOWN_BLOCK_KWARGS,
                     up_block_kwargs=UP_BLOCK_KWARGS)
    latent_c = args.c_base * 2 ** (args.depth - 1)
    disc_kwargs = dict(c_in=latent_c, c_out=2 * latent_c, conv_k=2, conv_s=2,
                       conv_pad=0, l_in=2 * latent_c, l_out=latent_c,
                       batch_norm=False, act="l_relu", p_drop=0.0,
                       n_domains=n_domains)

    ae = AE(**ae_kwargs)
    disc = Discriminator(**disc_kwargs)

    key = jax.random.key(0)
    x0 = jnp.zeros((1,) + (args.img_size,) * 3 + (1,))
    ae_state = create_train_state(ae, torch_adam(1e-4), x0, key)
    latent0, _ = ae.apply(ae_state.variables, x0, method=AE.encode)
    disc_state = create_train_state(disc, torch_adam(1e-4), latent0, key)

    # split the AE state into encoder/decoder sub-states for the fader steps
    from mri_epilepsy_diagnosis_tpu.models.fader import Decoder, Encoder
    enc = Encoder(deapth=args.depth,
                  chanels=tuple([1] + [args.c_base * 2 ** i
                                       for i in range(args.depth)]),
                  down_block_kwargs=DOWN_BLOCK_KWARGS)
    dec = Decoder(deapth=args.depth,
                  chanels=tuple([args.c_base * 2 ** i
                                 for i in range(args.depth - 1, -1, -1)] + [1]),
                  up_block_kwargs=UP_BLOCK_KWARGS)
    enc_state = create_train_state(
        enc, torch_adam(1e-4), x0,
        variables={"params": ae_state.params["enc"],
                   "batch_stats": ae_state.batch_stats["enc"]})
    sizes0 = [tuple(args.img_size // 2 ** i for _ in range(3))
              for i in range(args.depth)]
    dec_state = create_train_state(
        dec, torch_adam(1e-4), None,
        variables={"params": ae_state.params["dec"],
                   "batch_stats": (ae_state.batch_stats or {}).get("dec", {}) or None})
    fstate = FaderState(encoder=enc_state, clf=None, disc=disc_state,
                        decoder=dec_state)

    loader = DataLoader(data, batch_size=3, shuffle=True)
    lambda_t, lam_step, max_step, step = 0.0, 1e-4 / 500000, 500000, 0
    for epoch in range(args.epochs):
        for batch in loader:
            x = jnp.asarray(batch[0])
            if args.bf16:
                x = x.astype(jnp.bfloat16)
            dom = jnp.asarray(np.asarray(batch[2]), jnp.int32)
            for _ in range(args.disc_loop):
                key, sub = jax.random.split(key)
                fstate, loss_disc, _ = disc_step(fstate, x, dom, sub, n_domains)
            key, sub = jax.random.split(key)
            fstate, loss = ae_step(fstate, x, dom, jnp.float32(lambda_t), sub)
            step += 1
            if step < max_step:
                lambda_t += lam_step
        print(f"epoch {epoch}: rec+adv loss {float(loss):.5f} "
              f"disc loss {float(loss_disc):.5f}")


if __name__ == "__main__":
    main()
