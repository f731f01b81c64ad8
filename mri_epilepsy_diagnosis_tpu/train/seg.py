"""Segmentation training: dice-loss steps and the epoch driver.

Capability-parity with `segmentation/routine.py:261-361`: an initial
VALIDATE epoch, then TRAIN/VALIDATE per epoch; softmax -> soft dice loss
(mean over batch and classes); ReduceLROnPlateau stepped on the mean
validation loss; periodic checkpointing to `weights/{stem}_epoch_{i}.ckpt`;
optional per-batch experiment logging.  Label binarization (LIST_FCD +
cortical >= 1000) happens in-graph (`transforms.binarize_segmentation`)
instead of in a CPU worker.

`get_model_and_optimizer` mirrors the reference factory: seeded UNet
(ocfl 16 or 8), AdamW defaults, plateau scheduler (factor 0.1, patience 3,
threshold 0.01).
"""
from __future__ import annotations

import enum
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.dice import get_dice_loss
from ..models.unet import UNet3D
from ..transforms.labels import binarize_segmentation
from .checkpoint import save_checkpoint
from .optim import ReduceLROnPlateau, torch_adamw
from .state import TrainState, create_train_state


class Action(enum.Enum):
    TRAIN = "Training"
    VALIDATE = "Validation"


def _dice_loss_from_logits(logits, targets):
    """softmax over the channel (last) axis -> soft dice -> mean."""
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jnp.concatenate([1.0 - targets, targets], axis=-1)
    return jnp.mean(get_dice_loss(probs, onehot, spatial_dimensions=(1, 2, 3)))


@functools.partial(jax.jit, donate_argnums=(0,))
def seg_train_step(state: TrainState, inputs, raw_labels):
    """inputs (N,D,H,W,1) float; raw_labels (N,D,H,W,1) FreeSurfer ids or
    already-binary masks (binarize_segmentation keeps existing 1s, like the
    reference's prepare_batch)."""
    targets = binarize_segmentation(raw_labels)
    # dropout / Bayesian-sampling rngs, fresh per optimizer step.  Keys are
    # built by bit-packing (wrap_key_data) rather than fold_in: in-graph
    # threefry hashing crashes this platform's remote compiler on large
    # graphs, and key *construction* needs no hashing.
    rngs = {k: jax.random.wrap_key_data(
                jnp.stack([jnp.uint32(i), state.step.astype(jnp.uint32)]))
            for i, k in enumerate(("dropout", "sample"))}

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            logits, new_vars = state.apply_fn(variables, inputs, train=True,
                                              rngs=rngs,
                                              mutable=["batch_stats"])
            bs = new_vars.get("batch_stats")
        else:
            logits = state.apply_fn(variables, inputs, train=True, rngs=rngs)
            bs = None
        return _dice_loss_from_logits(logits, targets), bs

    (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads, new_batch_stats=bs)
    return state, loss


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3, 4))
def _packed_seg_train_step(state: TrainState, inputs, raw_labels,
                           remat: bool, dec_up: str = "explicit"):
    from ..models.unet_packed import packed_dice_loss, packed_unet_train_apply

    targets = binarize_segmentation(raw_labels)

    def loss_fn(params):
        logits_p, bs = packed_unet_train_apply(
            {"params": params, "batch_stats": state.batch_stats}, inputs,
            remat=remat, dec_up=dec_up)
        return packed_dice_loss(logits_p, targets), bs

    (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads, new_batch_stats=bs)
    return state, loss


def packed_seg_train_step(state: TrainState, inputs, raw_labels,
                          remat: bool = False, dec_up: str = "explicit"):
    """`seg_train_step` in the packed (space-to-depth) execution layout
    (models/unet_packed.py) — same numerics (exact fine-equivalent BatchNorm
    batch statistics, dice over the sub-position-folded voxel set), but the
    graph runs at S/2 spatial cells with 128-lane channels: ~3x faster on
    TPU and, critically, the only layout whose 192^3 whole-volume train
    graph this platform's remote compiler accepts (fine + fine-remat both
    crash it — experiments/train192_probe.py).  UNet3D (ocfl-any, nb=3)
    only.  `remat=True` additionally rematerializes each two-conv block in
    the backward (smaller live set for batch >= 2 whole volumes).  `dec_up`
    picks the decoder up-branch formulation (see
    `packed_unet_train_apply`); "explicit" is the training default."""
    return _packed_seg_train_step(state, inputs, raw_labels, remat, dec_up)


@jax.jit
def seg_eval_step(state: TrainState, inputs, raw_labels):
    targets = binarize_segmentation(raw_labels)
    # Bayesian conv variants sample even in eval (pruned-mask local reparam)
    logits = state.apply_fn(state.variables, inputs, train=False,
                            rngs={"sample": jax.random.key(0)})
    return _dice_loss_from_logits(logits, targets)


@jax.jit
def packed_seg_eval_step(state: TrainState, inputs, raw_labels):
    from ..models.unet_packed import packed_unet_apply_v2

    targets = binarize_segmentation(raw_labels)
    logits = packed_unet_apply_v2(state.variables, inputs)
    return _dice_loss_from_logits(logits, targets)


def run_epoch(epoch_idx: int, action: Action, loader, state: TrainState,
              scheduler=None, experiment=None, prefetch: int = 2,
              sharding=None, packed: bool = False, input_dtype=None):
    """One pass; returns (state, np.array of batch losses).

    Host batch prep is overlapped with device compute by staging `prefetch`
    batches ahead as committed device arrays (`data.prefetch_to_device`);
    `sharding` places them on a mesh.  `prefetch=0` keeps the synchronous
    transfer-per-step path.  `packed=True` trains through the packed
    (space-to-depth) execution layout — required for 192^3 whole-volume
    training on this platform and ~3x faster (UNet3D nb=3 only);
    `packed="remat"` additionally rematerializes each two-conv block in the
    backward (required to compile 192^3 whole-volume batches >= 2).
    `input_dtype=jnp.bfloat16` trains mixed precision: bf16 activations and
    conv compute with f32 master weights/optimizer/BatchNorm statistics —
    the TPU production mode, ~1.5x the f32 step rate at 192^3 (quality gate:
    tests/test_quality_gates.py::test_packed_bf16_train_reaches_dice_095...)."""
    from ..data.pipeline import prefetch_to_device

    train_step = (functools.partial(packed_seg_train_step,
                                    remat=(packed == "remat"))
                  if packed else seg_train_step)
    eval_step = packed_seg_eval_step if packed else seg_eval_step
    is_training = action == Action.TRAIN
    epoch_losses = []
    batches = (prefetch_to_device(iter(loader), size=prefetch,
                                  sharding=sharding)
               if prefetch > 0 else loader)
    for batch in batches:
        inputs = jnp.asarray(batch[0])
        if input_dtype is not None:
            inputs = inputs.astype(input_dtype)
        targets = jnp.asarray(batch[1])
        if is_training:
            state, loss = train_step(state, inputs, targets)
        else:
            loss = eval_step(state, inputs, targets)
        loss_val = float(loss)
        epoch_losses.append(loss_val)
        if experiment:
            experiment.log_metric(
                "train_dice_loss" if is_training else "validate_dice_loss",
                loss_val)
    return state, np.array(epoch_losses)


def train_segmentation(num_epochs: int, training_loader, validation_loader,
                       state: TrainState, scheduler: Optional[ReduceLROnPlateau],
                       weights_stem: str, save_epoch: int = 1,
                       experiment=None, verbose: bool = True,
                       weights_dir: str = "weights", sharding=None,
                       dashboard=None, packed: bool = False, manager=None,
                       max_failures: int = 3, input_dtype=None):
    """`sharding` (optional NamedSharding) places every prefetched batch on a
    device mesh — data/spatial-parallel training over `core.mesh.create_mesh`
    with the same loop.  `packed=True` routes train steps through the packed
    execution layout; `packed="remat"` adds per-block rematerialization for
    whole-volume batches >= 2 (see `run_epoch`).  `manager` (a
    `train.resilience.CheckpointManager`) switches on elastic mode:
    auto-resume from the newest checkpoint (incl. scheduler state), atomic
    rolling per-epoch checkpoints (instead of the `save_epoch` cadence),
    rollback on a non-finite train/validation epoch, and graceful
    SIGTERM/SIGINT checkpointed shutdown."""
    state, tr, va, _ = _train_loop(
        num_epochs, training_loader, validation_loader, state, scheduler,
        weights_stem, save_epoch, experiment, verbose, weights_dir, sharding,
        dashboard, packed, manager, max_failures, input_dtype)
    return state, tr, va


def _train_loop(num_epochs, training_loader, validation_loader, state,
                scheduler, weights_stem, save_epoch, experiment, verbose,
                weights_dir, sharding, dashboard, packed, manager,
                max_failures, input_dtype=None):
    """The single epoch driver behind `train_segmentation` and
    `train_segmentation_resilient`; returns (state, train_losses,
    val_losses, last_completed_epoch)."""
    import contextlib

    from .resilience import _PreemptionGuard  # lazy: resilience imports seg

    start_time = time.time()
    epoch_train_loss, epoch_val_loss = [], []
    start_epoch, failures = 0, 0

    def _restore_with_scheduler():
        st, ep = manager.restore_latest(state)
        if scheduler is not None and ep:
            sd = manager.load_extra(ep).get("scheduler")
            if sd and hasattr(scheduler, "load_state_dict"):
                scheduler.load_state_dict(sd)
        return st, ep

    def _save(st, epoch):
        if manager is not None:
            extra = {}
            if scheduler is not None and hasattr(scheduler, "state_dict"):
                extra["scheduler"] = scheduler.state_dict()
            manager.save(st, epoch, **extra)
        elif epoch > 0 and epoch % save_epoch == 0:
            save_checkpoint(
                f"{weights_dir}/{weights_stem}_epoch_{epoch}.ckpt", st)

    if manager is not None:
        state, start_epoch = _restore_with_scheduler()
        if verbose and start_epoch:
            print(f"resumed from epoch {start_epoch}")

    guard_cm = _PreemptionGuard() if manager is not None \
        else contextlib.nullcontext()
    with guard_cm as guard:
        stop = (lambda: guard.stop_requested) if manager is not None \
            else (lambda: False)
        if start_epoch == 0:  # the reference's initial VALIDATE epoch
            state, _ = run_epoch(0, Action.VALIDATE, validation_loader, state,
                                 scheduler, experiment, sharding=sharding,
                                 packed=packed, input_dtype=input_dtype)
            _save(state, 0)

        epoch_idx = start_epoch
        while epoch_idx < num_epochs and not stop():
            epoch_idx += 1
            state, tr = run_epoch(epoch_idx, Action.TRAIN, training_loader,
                                  state, scheduler, experiment,
                                  sharding=sharding, packed=packed,
                                  input_dtype=input_dtype)
            state, va = run_epoch(epoch_idx, Action.VALIDATE,
                                  validation_loader, state, scheduler,
                                  experiment, sharding=sharding,
                                  packed=packed, input_dtype=input_dtype)
            if manager is not None and not (np.all(np.isfinite(tr))
                                            and np.all(np.isfinite(va))):
                failures += 1
                if failures > max_failures:
                    raise RuntimeError(f"{failures} non-finite epochs; "
                                       f"aborting at epoch {epoch_idx}")
                if verbose:
                    print(f"epoch {epoch_idx}: non-finite loss — rolling "
                          f"back to last checkpoint "
                          f"({failures}/{max_failures})")
                if manager.latest_epoch() is None:
                    # never "roll back" to the just-poisoned in-memory state
                    raise RuntimeError(
                        f"epoch {epoch_idx} produced a non-finite loss and "
                        "no checkpoint exists to roll back to (checkpoints "
                        "pruned externally?)")
                state, epoch_idx = _restore_with_scheduler()
                continue
            failures = 0
            epoch_train_loss.append(float(np.mean(tr)))
            epoch_val_loss.append(float(np.mean(va)))
            if dashboard is not None:  # live per-epoch redraw
                dashboard.update(train_loss=epoch_train_loss[-1],
                                 val_loss=epoch_val_loss[-1])
            if verbose:
                print(f"Epoch {epoch_idx} of {num_epochs} took "
                      f"{time.time() - start_time:.3f}s")
                print(f"  training loss (in-iteration): \t{tr[-1]:.6f}")
                print(f"  validation loss: \t\t\t{va[-1]:.6f}")
            if scheduler:
                scheduler.step(epoch_val_loss[-1], state.opt_state)
            if experiment:
                experiment.log_epoch_end(epoch_idx)
            _save(state, epoch_idx)
        if manager is not None and stop() and verbose:
            print(f"preemption requested — checkpointed at epoch "
                  f"{epoch_idx}, exiting cleanly")
    return state, epoch_train_loss, epoch_val_loss, epoch_idx


def sweep_checkpoints(weights_dir: str, state: TrainState, loader,
                      pattern: str = "*.ckpt"):
    """Evaluate every checkpoint in a directory (the reference's sweep in
    `pretraining_3d_unet.ipynb` cell 17 printing DICE/IoU per epoch).
    Returns {path: (mean_dsc, mean_iou)} sorted by path."""
    import glob as _glob

    from .checkpoint import load_checkpoint

    results = {}
    for path in sorted(_glob.glob(f"{weights_dir}/{pattern}")):
        try:
            st = load_checkpoint(path, state)
            dsc, _, _, iou = validate_dsc_asd(st, loader)
            results[path] = (float(np.nanmean(dsc)), float(np.mean(iou)))
            print(f"{path}: DICE {results[path][0]:.4f} IoU {results[path][1]:.4f}")
        except Exception as e:  # mirror the reference's soft-fail sweep
            print(f"{path}: skipped ({type(e).__name__})")
    return results


def validate_dsc_asd(state: TrainState, loader, packed: bool = False):
    """Per-subject DSC + average surface distance + IoU over a loader
    (reference `segmentation/routine.py:217-237`).  Model forward runs
    batched on device (`packed=True` uses the packed execution layout —
    3x faster at 192^3, identical masks); surface metrics on host
    (native EDT)."""
    from ..metrics import (compute_average_surface_distance,
                           compute_dice_coefficient,
                           compute_surface_distances, get_iou_score)

    packed_mask = False
    variables = state.variables
    if packed:
        from ..models.unet_packed import (fold_bn_inference,
                                          packed_unet_apply_v2,
                                          packed_unet_mask_v2)
        out_c8 = state.params["classifier"]["conv_layer"]["weight"].shape[-1]
        packed_mask = out_c8 == 2  # binary: packed-space mask epilogue
        fwd = jax.jit(packed_unet_mask_v2 if packed_mask
                      else packed_unet_apply_v2)
        # eval-only: bake the current BN stats into the conv weights (exact,
        # ~2% faster + smaller graph — experiments/bn_fold_ab.py); host-side
        # math on the small param pytree, re-derived per call so sweeps see
        # each checkpoint's own statistics
        variables = fold_bn_inference(variables)
    else:
        fwd = lambda v, x: state.apply_fn(v, x, train=False)

    dsc, asd_mean, asd_std, iou = [], [], [], []
    for batch in loader:
        inputs = jnp.asarray(batch[0])
        targets = np.asarray(binarize_segmentation(jnp.asarray(batch[1])))
        out = fwd(variables, inputs)
        preds = np.asarray(out if packed_mask
                           else jnp.argmax(out, axis=-1)).astype(np.uint8)
        for i in range(preds.shape[0]):
            gt = targets[i, ..., 0].astype(np.uint8)
            pred = preds[i]
            sd = compute_surface_distances(gt, pred, spacing_mm=(1, 1, 1))
            m, s = compute_average_surface_distance(sd)
            dsc.append(compute_dice_coefficient(gt, pred))
            asd_mean.append(m)
            asd_std.append(s)
            iou.append(get_iou_score(pred, gt))
    return dsc, asd_mean, asd_std, iou


def get_model_and_optimizer(sample_input=None, num_encoding_blocks: int = 3,
                            out_channels_first_layer: int = 16,
                            patience: int = 3, seed: int = 0):
    """Seeded model/optimizer/scheduler factory
    (`segmentation/routine.py:338-361` semantics)."""
    model = UNet3D(in_channels=1, out_classes=2,
                   num_encoding_blocks=num_encoding_blocks,
                   out_channels_first_layer=out_channels_first_layer)
    if sample_input is None:
        sample_input = jnp.zeros((1, 16, 16, 16, 1))
    tx = torch_adamw()  # AdamW defaults, as the reference
    state = create_train_state(model, tx, sample_input, jax.random.key(seed))
    scheduler = ReduceLROnPlateau(1e-3, mode="min", factor=0.1,
                                  patience=patience, threshold=0.01)
    return model, state, scheduler
