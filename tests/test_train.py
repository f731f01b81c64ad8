"""Training loops: segmentation, classification, CV, fader, schedulers.

Runs with the 'fast' contraction-precision override: XLA CPU compiles
exact-precision conv gradients ~25x slower, and convergence behavior does
not depend on bit-exact contractions (parity tests cover numerics).
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
from mri_epilepsy_diagnosis_tpu.models import UNet3D, VoxResNet
from mri_epilepsy_diagnosis_tpu.train import (
    ReduceLROnPlateau, cross_val_score, load_checkpoint, run_one_epoch,
    save_checkpoint, stratified_batch_indices, train)
from mri_epilepsy_diagnosis_tpu.train.classification import create_model_opt
from mri_epilepsy_diagnosis_tpu.train.seg import (
    Action, get_model_and_optimizer, run_epoch, seg_train_step,
    train_segmentation)
from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
from mri_epilepsy_diagnosis_tpu.utils.data import SyntheticVolumes


class _SegData:
    """Tiny seg dataset: blob volumes + exact masks, (C,D,H,W) items."""

    def __init__(self, n=6, size=24):
        base = SyntheticVolumes(n=n, img_shape=(size,) * 3, kind="blobs")
        self.items = [base.as_segmentation()[i] for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_seg_training_reduces_loss():
    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
    tx = torch_adamw(1e-3)
    state = create_train_state(model, tx, jnp.zeros((1, 8, 8, 8, 1)))
    loader = DataLoader(_SegData(n=4, size=16), batch_size=2)
    state, first = run_epoch(0, Action.TRAIN, loader, state)
    for _ in range(4):
        state, losses = run_epoch(0, Action.TRAIN, loader, state)
    assert losses.mean() < first.mean()


def test_train_segmentation_driver(tmp_path):
    model, state, scheduler = get_model_and_optimizer(
        jnp.zeros((1, 8, 8, 8, 1)), out_channels_first_layer=4)
    loader = DataLoader(_SegData(n=2, size=16), batch_size=1)
    state, tr, va = train_segmentation(
        2, loader, loader, state, scheduler, "unit", save_epoch=1,
        verbose=False, weights_dir=str(tmp_path))
    assert len(tr) == 2 and (tmp_path / "unit_epoch_2.ckpt").exists()


def test_checkpoint_roundtrip(tmp_path):
    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
    tx = torch_adamw(1e-3)
    state = create_train_state(model, tx, jnp.zeros((1, 8, 8, 8, 1)))
    loader = DataLoader(_SegData(n=2, size=16), batch_size=1)
    state, _ = run_epoch(0, Action.TRAIN, loader, state)
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, state, note="hi")

    model2, state2, _ = get_model_and_optimizer(
        jnp.zeros((1, 8, 8, 8, 1)), num_encoding_blocks=2,
        out_channels_first_layer=4)
    state2 = load_checkpoint(p, state2)
    assert int(state2.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class _ClsData:
    """Two classes distinguished by mean intensity."""

    def __init__(self, n=12, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.target = rng.permutation(np.arange(n) % 2)
        self.vols = [
            (rng.normal(2.0 * t, 1.0, size=(1, size, size, size))
             .astype(np.float32)) for t in self.target]
        self.scan = np.zeros(n, np.int64)

    def __len__(self):
        return len(self.vols)

    def __getitem__(self, i):
        return self.vols[i], int(self.target[i]), int(self.scan[i])


def _small_voxresnet():
    return VoxResNet(input_shape=(16, 16, 16), n_filters=4, stride=1,
                     n_blocks=3, n_fc_units=16)


def test_classification_train_improves():
    from sklearn.metrics import roc_auc_score

    model = _small_voxresnet()
    data = _ClsData(n=12)
    loader = DataLoader(data, batch_size=4)
    state, scheduler = create_model_opt(model, jnp.zeros((1, 16, 16, 16, 1)),
                                        lr=3e-3)
    state, tl, tm, vl, vm = train(state, loader, loader, roc_auc_score,
                                  scheduler=scheduler, max_epoch=10,
                                  max_patience=20)
    assert vm is not None and vm > 0.8


def test_cross_val_score_runs():
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import StratifiedKFold

    model = _small_voxresnet()
    data = _ClsData(n=8)
    scores = cross_val_score(model, data, StratifiedKFold(2), roc_auc_score,
                             jnp.zeros((1, 16, 16, 16, 1)), batch_size=4,
                             max_epoch=1, lr=1e-3)
    assert len(scores) == 2 and all(s is not None for s in scores)


def test_stratified_batch_indices_matches_reference_semantics():
    idx = np.arange(10)
    labels = np.array([0, 0, 0, 0, 0, 0, 0, 1, 1, 1])
    out = stratified_batch_indices(idx, labels)
    assert sorted(out.tolist()) == idx.tolist()
    # minority label appears once near the start of each stride of ~step
    minority_positions = [i for i, v in enumerate(out) if labels[v] == 1]
    assert minority_positions[0] == 0 and len(minority_positions) == 3


def test_reduce_lr_on_plateau_matches_torch():
    import torch

    lin = torch.nn.Linear(1, 1)
    topt = torch.optim.SGD(lin.parameters(), lr=1.0)
    tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=2, threshold=0.01)
    mine = ReduceLROnPlateau(1.0, mode="min", factor=0.5, patience=2,
                             threshold=0.01)
    seq = [1.0, 0.99, 0.98, 0.985, 0.986, 0.987, 0.99, 0.5, 0.6, 0.7, 0.8, 0.9]
    for v in seq:
        tsch.step(v)
        mine.step(v)
        assert abs(topt.param_groups[0]["lr"] - mine.lr) < 1e-9, v


def test_fader_training_steps():
    from mri_epilepsy_diagnosis_tpu.models import Classificator, Discriminator
    from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
    from mri_epilepsy_diagnosis_tpu.train.fader import FaderState, train_fader
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    ae_kw = dict(c_in=1, c_base=4, inc_size=2, deapth=2, reduce_size=False,
                 down_block_kwargs=dict(conv_k=6, conv_pad=2, conv_s=2,
                                        maxpool_k=2, maxpool_s=2,
                                        batch_norm=True, act="l_relu"))
    head_kw = dict(c_in=8, c_out=16, conv_k=2, conv_s=1, conv_pad=0,
                   l_in=16, l_out=8, batch_norm=True, act="relu", p_drop=0.5)
    n_domains = 3

    enc = make_encoder(ae_kw)
    clf = Classificator(n_class=2, **head_kw)
    disc = Discriminator(n_domains=n_domains, **head_kw)

    # domains encoded in intensity so the disc has something to learn
    rng = np.random.default_rng(0)
    doms = rng.integers(0, n_domains, 12)
    x_all = np.stack([rng.normal(d, 0.3, size=(1, 32, 32, 32))
                      for d in doms]).astype(np.float32)
    ys = rng.integers(0, 2, 12)

    class _DS:
        target = ys
        scan = doms

        def __len__(self):
            return 12

        def __getitem__(self, i):
            return x_all[i], int(ys[i]), int(doms[i])

    loader = DataLoader(_DS(), batch_size=4)

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

    fstate, hist = train_fader(fstate, loader, loader, epochs=2,
                               lambda_initial=1e-4, lambda_step=3e-4,
                               max_step=300, n_domains=n_domains,
                               disc_loop=2, verbose=False)
    assert len(hist["train_loss"]) == 6      # 3 batches x 2 epochs
    assert hist["train_loss_disc"][-1] < hist["train_loss_disc"][0]
    assert len(hist["acc"]) == 2

    # mixed precision (input_dtype=bf16: bf16 activations, f32 master
    # weights — the TPU perf mode, experiments/aux_bf16_probe.py): the
    # same loop must run, produce finite losses, and keep f32 params
    fstate, hist16 = train_fader(fstate, loader, loader, epochs=1,
                                 lambda_initial=1e-4, lambda_step=3e-4,
                                 max_step=300, n_domains=n_domains,
                                 disc_loop=1, verbose=False,
                                 input_dtype=jnp.bfloat16)
    assert np.isfinite(hist16["train_loss"]).all()
    leaves = jax.tree_util.tree_leaves(fstate.encoder.params)
    assert all(p.dtype == jnp.float32 for p in leaves)


@pytest.mark.isolated
def test_packed_seg_training_loop():
    """train_segmentation(packed=True): the packed execution-layout steps
    drive the same epoch loop (train + eval) and reduce the loss.

    `isolated`: this exact test segfaulted two full-suite runs (r3 + r4
    baseline) inside XLA's CPU `backend_compile_and_load` after ~200
    in-process compiles, while passing standalone every time — the
    accumulated-compile-state crash the conftest subprocess isolation
    exists for."""
    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=3)
    state = create_train_state(model, torch_adamw(1e-3),
                               jnp.zeros((1, 16, 16, 16, 1)))
    loader = DataLoader(_SegData(n=4, size=16), batch_size=2)
    from mri_epilepsy_diagnosis_tpu.train.seg import train_segmentation
    state, tr, va = train_segmentation(
        3, loader, loader, state, scheduler=None, weights_stem="pk",
        save_epoch=99, verbose=False, weights_dir="/tmp/pk_w", packed=True)
    assert tr[-1] < tr[0] + 1e-6 and np.isfinite(va[-1])
