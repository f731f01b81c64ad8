"""Failure detection and elastic recovery for long training runs.

The reference has no failure handling at all (SURVEY.md §5: no retry, no
preemption handling; ad-hoc `try/except: pass`).  TPU pods get preempted
and large runs hit transient numerics, so this subsystem adds the three
standard production behaviors around the existing epoch driver
(`train/seg.py::run_epoch`):

- **atomic rolling checkpoints** (`CheckpointManager`): write-then-rename so
  a preemption mid-save never corrupts the latest checkpoint; keep-last-k
  pruning; latest-checkpoint discovery for restarts.
- **auto-resume**: `train_segmentation_resilient` restarts from the newest
  checkpoint in the directory — rerunning the same command after a
  preemption continues the run (epoch + optimizer state + batch stats are
  all in the checkpoint, unlike the reference's bare state_dict saves).
- **failure detection + rollback**: a non-finite epoch loss (TPU numerics
  blowup, bad batch) rolls parameters back to the last good checkpoint
  instead of poisoning the run; repeated failures abort with a clear error.
- **graceful preemption**: SIGTERM/SIGINT trigger an emergency checkpoint
  at the next epoch boundary before exiting.
"""
from __future__ import annotations

import glob
import os
import re
import signal
from typing import Optional

import numpy as np

from .checkpoint import load_checkpoint, save_checkpoint
from .optim import ReduceLROnPlateau
from .seg import Action, run_epoch
from .state import TrainState


class CheckpointManager:
    """Rolling, atomically-written checkpoints `{stem}_epoch_{N}.ckpt`."""

    def __init__(self, directory: str, stem: str = "run", keep: int = 3):
        self.directory = directory
        self.stem = stem
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"{self.stem}_epoch_{epoch}.ckpt")

    def _epochs(self):
        pat = re.compile(rf"{re.escape(self.stem)}_epoch_(\d+)\.ckpt$")
        out = []
        for p in glob.glob(os.path.join(self.directory,
                                        f"{self.stem}_epoch_*.ckpt")):
            m = pat.search(os.path.basename(p))
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def save(self, state: TrainState, epoch: int, **extra) -> str:
        """Atomic: serialize to `.tmp`, then `os.replace` into place."""
        path = self._path(epoch)
        tmp = path + ".tmp"
        save_checkpoint(tmp, state, epoch=epoch, **extra)
        os.replace(tmp, path)
        for old in self._epochs()[:-self.keep]:
            try:
                os.remove(self._path(old))
            except OSError:
                pass
        return path

    def latest_epoch(self) -> Optional[int]:
        eps = self._epochs()
        return eps[-1] if eps else None

    def restore_latest(self, state: TrainState):
        """-> (state, epoch) from the newest checkpoint, or (state, 0)."""
        epoch = self.latest_epoch()
        if epoch is None:
            return state, 0
        return load_checkpoint(self._path(epoch), state), epoch


class _PreemptionGuard:
    """Latches SIGTERM/SIGINT; the training loop polls `stop_requested` at
    epoch boundaries and checkpoints before exiting."""

    def __init__(self):
        self.stop_requested = False
        self._old = {}

    def __enter__(self):
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._old[sig] = signal.signal(sig, self._handler)
            except ValueError:  # not the main thread — poll-only mode
                pass
        return self

    def _handler(self, signum, frame):
        self.stop_requested = True

    def __exit__(self, *exc):
        for sig, old in self._old.items():
            signal.signal(sig, old)
        return False


def train_segmentation_resilient(
        num_epochs: int, training_loader, validation_loader,
        state: TrainState, scheduler: Optional[ReduceLROnPlateau],
        manager: CheckpointManager, experiment=None, verbose: bool = True,
        sharding=None, packed: bool = False, max_failures: int = 3):
    """`train_segmentation` with auto-resume, non-finite rollback and
    preemption-safe checkpointing.  Returns (state, train losses, val
    losses, completed_epoch); rerun the same call to continue after a kill.
    """
    state, start_epoch = manager.restore_latest(state)
    if verbose and start_epoch:
        print(f"resumed from epoch {start_epoch}")
    epoch_train_loss, epoch_val_loss = [], []
    failures = 0

    with _PreemptionGuard() as guard:
        if start_epoch == 0:  # the reference's initial VALIDATE epoch
            state, _ = run_epoch(0, Action.VALIDATE, validation_loader,
                                 state, scheduler, experiment,
                                 sharding=sharding, packed=packed)
            manager.save(state, 0)

        epoch_idx = start_epoch
        while epoch_idx < num_epochs:
            epoch_idx += 1
            state, tr = run_epoch(epoch_idx, Action.TRAIN, training_loader,
                                  state, scheduler, experiment,
                                  sharding=sharding, packed=packed)
            if not np.all(np.isfinite(tr)):
                failures += 1
                if failures > max_failures:
                    raise RuntimeError(
                        f"{failures} non-finite epochs; aborting at epoch "
                        f"{epoch_idx}")
                if verbose:
                    print(f"epoch {epoch_idx}: non-finite loss — rolling "
                          f"back to last checkpoint ({failures}/"
                          f"{max_failures})")
                state, epoch_idx = manager.restore_latest(state)
                continue
            failures = 0
            state, va = run_epoch(epoch_idx, Action.VALIDATE,
                                  validation_loader, state, scheduler,
                                  experiment, sharding=sharding,
                                  packed=packed)
            epoch_train_loss.append(float(np.mean(tr)))
            epoch_val_loss.append(float(np.mean(va)))
            if scheduler:
                scheduler.step(epoch_val_loss[-1], state.opt_state)
            if experiment:
                experiment.log_epoch_end(epoch_idx)
            manager.save(state, epoch_idx)
            if guard.stop_requested:
                if verbose:
                    print(f"preemption requested — checkpointed at epoch "
                          f"{epoch_idx}, exiting cleanly")
                break
    return state, epoch_train_loss, epoch_val_loss, epoch_idx
