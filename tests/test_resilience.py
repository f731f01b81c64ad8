"""Failure detection / elastic recovery (train/resilience.py) — a subsystem
the reference lacks entirely (SURVEY.md §5: no retry, no preemption
handling)."""
import os

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
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.train import (CheckpointManager,
                                              create_train_state, torch_adamw,
                                              train_segmentation_resilient)
from mri_epilepsy_diagnosis_tpu.utils.data import SyntheticVolumes


class _SegData:
    def __init__(self, n=4, size=16):
        base = SyntheticVolumes(n=n, img_shape=(size,) * 3, kind="blobs")
        self.items = [base.as_segmentation()[i] for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _PoisonOnce:
    """Wraps a dataset; serves NaN inputs for exactly one full epoch pass
    once `arm()` is called."""

    def __init__(self, inner):
        self.inner = inner
        self.poison = False

    def arm(self):
        self.poison = True

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, i):
        img, mask = self.inner[i]
        if self.poison:
            if i == len(self.inner) - 1:
                self.poison = False
            return np.full_like(np.asarray(img), np.nan), mask
        return img, mask


def _make_state():
    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
    return create_train_state(model, torch_adamw(1e-3),
                              jnp.zeros((1, 8, 8, 8, 1)))


def test_checkpoint_manager_rolls_and_restores(tmp_path):
    state = _make_state()
    mgr = CheckpointManager(str(tmp_path), stem="t", keep=2)
    assert mgr.latest_epoch() is None
    for ep in (1, 2, 3):
        mgr.save(state.replace(step=ep), ep)
    assert mgr.latest_epoch() == 3
    assert sorted(os.listdir(tmp_path)) == ["t_epoch_2.ckpt", "t_epoch_3.ckpt"]
    restored, ep = mgr.restore_latest(state)
    assert ep == 3 and int(restored.step) == 3


def test_resilient_resume_continues_run(tmp_path):
    loader = DataLoader(_SegData(), batch_size=2)
    mgr = CheckpointManager(str(tmp_path), stem="r")
    state = _make_state()
    state, tr1, _, done1 = train_segmentation_resilient(
        2, loader, loader, state, None, mgr, verbose=False)
    assert done1 == 2 and len(tr1) == 2
    # a fresh process (fresh template state) resumes at epoch 2, trains 3-4
    state2, tr2, _, done2 = train_segmentation_resilient(
        4, loader, loader, _make_state(), None, mgr, verbose=False)
    assert done2 == 4 and len(tr2) == 2
    assert mgr.latest_epoch() == 4


def test_resilient_rolls_back_on_nonfinite(tmp_path):
    data = _PoisonOnce(_SegData())
    loader = DataLoader(data, batch_size=2)
    mgr = CheckpointManager(str(tmp_path), stem="n")
    state = _make_state()
    # one clean epoch, then poison the next
    state, tr, _, done = train_segmentation_resilient(
        1, loader, loader, state, None, mgr, verbose=False)
    data.arm()
    state, tr, va, done = train_segmentation_resilient(
        3, loader, loader, state, None, mgr, verbose=False, max_failures=3)
    assert done == 3
    assert np.all(np.isfinite(tr)) and np.all(np.isfinite(va))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))



def test_resilient_restores_scheduler_state(tmp_path):
    """Auto-resume must restore the plateau scheduler's decayed LR state
    (a fresh scheduler object would silently reset LR to base)."""
    from mri_epilepsy_diagnosis_tpu.train import ReduceLROnPlateau

    loader = DataLoader(_SegData(), batch_size=2)
    mgr = CheckpointManager(str(tmp_path), stem="s")
    sched = ReduceLROnPlateau(1e-3, factor=0.5, patience=0)
    sched.step(1.0)
    sched.step(2.0)  # worse with patience 0 -> decay
    assert sched.scale < 1.0
    state, *_ = train_segmentation_resilient(
        1, loader, loader, _make_state(), sched, mgr, verbose=False)
    saved_scale = sched.scale
    fresh = ReduceLROnPlateau(1e-3, factor=0.5, patience=0)
    train_segmentation_resilient(
        2, loader, loader, _make_state(), fresh, mgr, verbose=False)
    assert fresh.scale <= saved_scale < 1.0


def test_checkpoint_manager_glob_metachar_stem(tmp_path):
    state = _make_state()
    mgr = CheckpointManager(str(tmp_path), stem="run[1]")
    mgr.save(state, 1)
    mgr.save(state, 2)
    assert mgr.latest_epoch() == 2
