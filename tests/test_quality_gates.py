"""Synthetic end-to-end QUALITY gates (not just loss-decreases).

The reference's headline quality numbers (whole-brain Dice 0.9399,
`segmentation/results_validation.ipynb` cell 9; fader holdout acc/AUC 0.948,
`classification/train_ENC_CLF.ipynb` cell 23) need the real MRI bank, which
is not in this image.  These tests are the strongest available proxy: the
same training loops driven to a *quality threshold* on synthetic data —
(a) the flagship ocfl=8 UNet reaches whole-volume Dice >= 0.95 on blob
volumes within a bounded number of epochs, and (b) the fader adversarial
loop drives the discriminator's domain accuracy from well-learned down
through chance while classification accuracy holds.
"""
import numpy as np
import pytest

from mri_epilepsy_diagnosis_tpu.ops import functional as _F


@pytest.fixture(autouse=True, scope="module")
def _fast_precision():
    _F.set_precision_override("fast")
    yield
    _F.set_precision_override(None)


import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.data.pipeline import DataLoader
from mri_epilepsy_diagnosis_tpu.metrics import compute_dice_coefficient
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.train.seg import Action, run_epoch
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.utils.data import SyntheticVolumes


def test_unet_reaches_dice_095_on_blobs():
    """Flagship UNet (ocfl=8, nb=3 — `segmentation/routine.py:338-361`
    config) trained on synthetic blob volumes must reach whole-volume
    Dice >= 0.95 within 25 epochs (typically ~12)."""
    seg = SyntheticVolumes(n=4, img_shape=(24,) * 3,
                           kind="blobs").as_segmentation()

    class _DS:
        def __len__(self):
            return len(seg)

        def __getitem__(self, i):
            return seg[i]

    loader = DataLoader(_DS(), batch_size=2)
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    state = create_train_state(model, torch_adamw(3e-3),
                               jnp.zeros((1, 8, 8, 8, 1)))
    fwd = jax.jit(lambda v, x: jnp.argmax(
        model.apply(v, x, train=False), axis=-1))

    best = 0.0
    for epoch in range(25):
        state, _ = run_epoch(epoch, Action.TRAIN, loader, state)
        dices = []
        for i in range(len(seg)):
            img, mask = seg[i]
            x = jnp.asarray(img.transpose(1, 2, 3, 0)[None])
            pred = np.asarray(fwd(state.variables, x))[0].astype(np.uint8)
            dices.append(compute_dice_coefficient(
                mask[0].astype(np.uint8), pred))
        best = max(best, float(np.mean(dices)))
        if best >= 0.95:
            break
    assert best >= 0.95, f"whole-volume dice only reached {best:.4f}"


def test_packed_bf16_train_reaches_dice_095_on_blobs():
    """Mixed-precision quality gate: the packed train step with bf16
    activations (f32 master weights/opt/BN stats — the TPU production
    training mode, bench.py `train_dtype=bf16`) must reach the same
    whole-volume Dice >= 0.95 as the f32 gate above."""
    from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step

    seg = SyntheticVolumes(n=4, img_shape=(24,) * 3,
                           kind="blobs").as_segmentation()
    xs = jnp.asarray(np.stack([seg[i][0].transpose(1, 2, 3, 0)
                               for i in range(len(seg))]))
    ys = jnp.asarray(np.stack([seg[i][1].transpose(1, 2, 3, 0)
                               for i in range(len(seg))]), jnp.float32)
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    state = create_train_state(model, torch_adamw(3e-3),
                               jnp.zeros((1, 8, 8, 8, 1)))
    fwd = jax.jit(lambda v, x: jnp.argmax(
        model.apply(v, x, train=False), axis=-1))

    best = 0.0
    for epoch in range(25):
        for lo in range(0, len(seg), 2):
            state, loss = packed_seg_train_step(
                state, xs[lo:lo + 2].astype(jnp.bfloat16), ys[lo:lo + 2])
        assert np.isfinite(float(loss))
        pred = np.asarray(fwd(state.variables, xs)).astype(np.uint8)
        dices = [compute_dice_coefficient(
            np.asarray(ys[i, ..., 0]).astype(np.uint8), pred[i])
            for i in range(len(seg))]
        best = max(best, float(np.mean(dices)))
        if best >= 0.95:
            break
    assert best >= 0.95, f"bf16 whole-volume dice only reached {best:.4f}"


def test_bf16_classification_train_loop_reaches_auc_09():
    """Mixed-precision classification gate: `train(..., input_dtype=bfloat16)`
    — the API behind the DilatedCNN reference-batch-10 bench (the only mode
    whose flat b10 graph this platform's compiler accepts,
    experiments/dilated_bf16_probe.py) — must reach holdout ROC-AUC >= 0.9
    on a synthetic two-class volume task, not merely reduce the loss."""
    from sklearn.metrics import roc_auc_score

    from mri_epilepsy_diagnosis_tpu.models import VoxResNet
    from mri_epilepsy_diagnosis_tpu.train.classification import train
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    rng = np.random.default_rng(1)
    n = 32
    ys = (np.arange(n) % 2).astype(np.int64)  # alternating -> any split balanced
    pattern = np.ones((1, 16, 16, 16), np.float32)
    pattern[:, :, :8] = -1.0
    x_all = np.stack([(2 * int(y) - 1) * pattern
                      + rng.normal(0, 0.5, size=(1, 16, 16, 16))
                      for y in ys]).astype(np.float32)

    class _DS:
        def __init__(self, idx):
            self.idx = np.asarray(idx)

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            j = self.idx[i]
            return x_all[j], int(ys[j])

    tr = DataLoader(_DS(np.arange(0, 24)), batch_size=8)
    va = DataLoader(_DS(np.arange(24, n)), batch_size=8)
    model = VoxResNet(input_shape=(16, 16, 16), n_filters=8, n_blocks=3)
    state = create_train_state(model, torch_adam(1e-3),
                               jnp.zeros((1, 16, 16, 16, 1)))
    state, _, _, _, vm = train(state, tr, va, roc_auc_score,
                               max_epoch=30, max_patience=30,
                               input_dtype=jnp.bfloat16)
    assert vm is not None and vm >= 0.9, f"bf16 holdout AUC only {vm}"


def test_fader_domain_confusion_while_clf_holds():
    """Adversarial gate: with lambda=0 the discriminator learns the domain
    (acc >= 0.6 vs chance 1/3) and the classifier its task (acc >= 0.9);
    under the lambda ramp the encoder drives domain accuracy down through
    chance (the reference's adv_loss pushes the disc toward *wrong*
    domains, so it falls below 1/3) while clf accuracy holds.
    Mechanism parity with `train_ENC_CLF.ipynb` cells 14/16."""
    from mri_epilepsy_diagnosis_tpu.models import Classificator, Discriminator
    from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
    from mri_epilepsy_diagnosis_tpu.train.fader import FaderState, train_fader
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    # BN/dropout off: at these tiny batch sizes encoder BatchNorm already
    # washes out the domain (mean-shift) signal, which would make the
    # adversarial gate vacuous
    ae_kw = dict(c_in=1, c_base=4, inc_size=2, deapth=2, reduce_size=False,
                 down_block_kwargs=dict(conv_k=6, conv_pad=2, conv_s=2,
                                        maxpool_k=2, maxpool_s=2,
                                        batch_norm=False, act="l_relu"))
    head_kw = dict(c_in=8, c_out=16, conv_k=2, conv_s=1, conv_pad=0,
                   l_in=16, l_out=8, batch_norm=False, act="relu", p_drop=0.0)
    n_domains = 3

    rng = np.random.default_rng(0)
    n = 24
    doms = np.arange(n) % n_domains
    ys = (np.arange(n) // n_domains) % 2
    rng.shuffle(doms)
    rng.shuffle(ys)
    # domain -> global mean shift (what the disc should learn, and the
    # encoder should then hide); class -> half-volume sign pattern
    # (domain-invariant, so clf accuracy can survive the adversarial push)
    pattern = np.ones((1, 32, 32, 32), np.float32)
    pattern[:, :, :16] = -1.0
    x_all = np.stack([
        2.0 * d + (2 * y - 1) * pattern
        + rng.normal(0, 0.5, size=(1, 32, 32, 32))
        for d, y in zip(doms, ys)]).astype(np.float32)

    class _DS:
        target = ys
        scan = doms

        def __len__(self):
            return n

        def __getitem__(self, i):
            return x_all[i], int(ys[i]), int(doms[i])

    loader = DataLoader(_DS(), batch_size=8)
    enc = make_encoder(ae_kw)
    clf = Classificator(n_class=2, **head_kw)
    disc = Discriminator(n_domains=n_domains, **head_kw)

    key = jax.random.key(0)
    x0 = jnp.zeros((1, 32, 32, 32, 1))
    enc_state = create_train_state(enc, torch_adam(7e-4, weight_decay=1e-4),
                                   x0, key)
    latent0, _ = enc.apply(enc_state.variables, x0)
    clf_state = create_train_state(clf, torch_adam(7e-4, weight_decay=1e-4),
                                   latent0, key)
    disc_state = create_train_state(disc, torch_adam(5e-4, weight_decay=1e-4),
                                    latent0, key)
    fstate = FaderState(encoder=enc_state, clf=clf_state, disc=disc_state)

    # phase 1: no adversarial pressure — disc and clf both learn
    fstate, h1 = train_fader(fstate, loader, loader, epochs=8,
                             lambda_initial=0.0, lambda_step=0.0,
                             max_step=1, n_domains=n_domains,
                             disc_loop=3, verbose=False)
    assert h1["acc"][-1] >= 0.9, f"clf acc {h1['acc'][-1]}"
    assert h1["acc_domain"][-1] >= 0.6, \
        f"disc never learned the domain: {h1['acc_domain'][-1]}"

    # phase 2: lambda ramp — encoder hides the domain, clf holds
    fstate, h2 = train_fader(fstate, loader, loader, epochs=12,
                             lambda_initial=1.0, lambda_step=0.25,
                             max_step=40, n_domains=n_domains,
                             disc_loop=1, verbose=False)
    assert h2["acc"][-1] >= 0.9, f"clf acc collapsed: {h2['acc'][-1]}"
    assert h2["acc_domain"][-1] <= 0.4, \
        f"domain acc did not fall through chance: {h2['acc_domain'][-1]}"
