"""Classification training: epoch loop, early stopping, stratified batches,
cross-validation harness with transfer/finetune modes.

Capability-parity with `utils/routine.py` + `classification/routine.py`:

- `run_one_epoch` returns (losses, probs, targets) with probs =
  softmax(outputs)[:, 1], and CE applied to whatever the model emits
  (the reference's DilatedCNN already outputs softmax — semantics kept).
- `train` replicates early stopping on (patience over best metric) and
  (train_loss < eps), best-metric checkpointing, optional per-batch
  ReduceLROnPlateau stepping on the train loss
  (`classification/routine.py:35`), and per-batch/per-epoch experiment
  logging.  The reference's `patience_`/`patience` mix-up
  (`classification/routine.py:127,142` — patience never triggers) is fixed
  (SURVEY.md §7, deliberate).
- `stratified_batch_indices` is numerically identical (scipy mode
  interleave).
- `cross_val_score` covers scratch / transfer (freeze all, new head) /
  finetune / eval-only modes with optional `holdout_idx` and rest-set
  validation by patient-id exclusion.

The hot path (forward+backward+update) is one jitted function per model;
data-parallel sharding comes from `parallel.shard_train_step`.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from ..data.pipeline import DataLoader, Subset
from .checkpoint import save_checkpoint, load_checkpoint
from .optim import ReduceLROnPlateau, torch_adam
from .state import TrainState, create_train_state


def cross_entropy(outputs, targets, weight=None):
    """torch nn.CrossEntropyLoss parity (incl. class weights)."""
    logp = jax.nn.log_softmax(outputs, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if weight is None:
        return jnp.mean(nll)
    w = jnp.asarray(weight)[targets]
    return jnp.sum(w * nll) / jnp.sum(w)


@functools.partial(jax.jit, static_argnames=("train",), donate_argnums=(0,))
def _class_step(state: TrainState, x, y, rng, train: bool):
    def loss_fn(params):
        variables = {"params": params}
        mutable = False
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if train else False
        rngs = {"dropout": rng, "sample": rng}
        if mutable:
            outputs, new_vars = state.apply_fn(variables, x, train=train,
                                               rngs=rngs, mutable=mutable)
            bs = new_vars.get("batch_stats")
        else:
            outputs = state.apply_fn(variables, x, train=train, rngs=rngs)
            bs = state.batch_stats
        loss = cross_entropy(outputs, y)
        return loss, (outputs, bs)

    if train:
        (loss, (outputs, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=bs)
    else:
        loss, (outputs, _) = loss_fn(state.params)
    probs = jax.nn.softmax(outputs, axis=-1)
    return state, loss, probs


def run_one_epoch(state: TrainState, loader, train: bool, rng_stream=None,
                  scheduler: Optional[ReduceLROnPlateau] = None,
                  experiment=None, epoch: int = 0, prefetch: int = 2,
                  input_dtype=None):
    """One pass over `loader`; returns (state, losses, probs, targets).

    Dropout/sampling randomness is seeded per epoch (fold_in of `epoch`)
    so masks differ across epochs while runs stay reproducible.  Host batch
    prep overlaps device compute via `prefetch` staged device batches
    (0 = synchronous).  `input_dtype=jnp.bfloat16` trains mixed precision:
    bf16 activations/conv compute with f32 master weights and optimizer
    moments (the seg-loop `input_dtype` contract, train/seg.py:132) — on
    this platform it is also the only mode whose flat batch-10 DilatedCNN
    graph compiles (experiments/dilated_bf16_probe.py)."""
    from ..data.pipeline import prefetch_to_device

    losses, probs, targets = [], [], []
    key = jax.random.fold_in(jax.random.key(0), epoch)
    batches = (prefetch_to_device(iter(loader), size=prefetch)
               if prefetch > 0 else loader)
    for batch in batches:
        x, y = batch[0], batch[1]
        x = jnp.asarray(x)
        if input_dtype is not None:
            x = x.astype(input_dtype)
        y = jnp.asarray(y).astype(jnp.int32)
        key, sub = jax.random.split(key if rng_stream is None
                                    else rng_stream.next())
        state, loss, p = _class_step(state, x, y, sub, train)
        loss_val = float(loss)
        if train and scheduler is not None:
            scheduler.step(loss_val, state.opt_state)
        losses.append(loss_val)
        probs.extend(np.asarray(p)[:, 1].tolist())
        targets.extend(np.asarray(y).tolist())
        if experiment:
            experiment.log_metric("train_loss" if train else "val_loss",
                                  loss_val)
    return state, losses, probs, targets


def train(state: TrainState, train_dataloader, val_dataloader, metric,
          scheduler: Optional[ReduceLROnPlateau] = None, verbose: int = 0,
          model_save_path: Optional[str] = None, max_epoch: int = 20,
          eps: float = 3e-3, max_patience: int = 10, experiment=None,
          dashboard=None, input_dtype=None):
    """Epoch driver; returns (state, last_train_loss, last_train_metric,
    last_val_loss, last_val_metric).  `input_dtype` threads to
    `run_one_epoch` (bf16 mixed-precision training)."""
    patience = 0
    best_metric = 0.0
    etl, etm, evl, evm = [], [], [], []
    last = dict(tl=None, tm=None, vl=None, vm=None)

    for epoch in range(max_epoch):
        t0 = time.time()
        state, tr_losses, tr_probs, tr_targets = run_one_epoch(
            state, train_dataloader, True, scheduler=scheduler,
            experiment=experiment, epoch=epoch, input_dtype=input_dtype)
        if val_dataloader is not None:
            state, v_losses, v_probs, v_targets = run_one_epoch(
                state, val_dataloader, False, experiment=experiment,
                epoch=epoch, input_dtype=input_dtype)

        etl.append(float(np.mean(tr_losses)))
        etm.append(metric(tr_targets, tr_probs))
        if experiment:
            experiment.log_metrics({"mean_train_loss": etl[-1],
                                    "train_metric": etm[-1]}, epoch=epoch)
        if val_dataloader is not None:
            evl.append(float(np.mean(v_losses)))
            evm.append(metric(v_targets, v_probs))
            if experiment:
                experiment.log_metrics({"mean_val_loss": evl[-1],
                                        "val_metric": evm[-1]}, epoch=epoch)
        if dashboard is not None:  # live per-epoch redraw
            dashboard.update(
                train_loss=etl[-1], train_metric=etm[-1],
                val_loss=evl[-1] if val_dataloader is not None else None,
                val_metric=evm[-1] if val_dataloader is not None else None)
        if verbose:
            print(f"Epoch {epoch + 1} of {max_epoch} took "
                  f"{time.time() - t0:.3f}s")
            print(f"  training loss: {etl[-1]:.6f}  metric: {etm[-1]:.4f}")
            if val_dataloader is not None:
                print(f"  validation loss: {evl[-1]:.6f}  metric: {evm[-1]:.4f}")

        improved = ((val_dataloader is not None and evm[-1] > best_metric)
                    or (val_dataloader is None and etm[-1] >= best_metric))
        if improved:
            patience = 0
            best_metric = evm[-1] if val_dataloader is not None else etm[-1]
            last = dict(tl=etl[-1], tm=etm[-1],
                        vl=evl[-1] if val_dataloader is not None else None,
                        vm=evm[-1] if val_dataloader is not None else None)
            if model_save_path is not None:
                save_checkpoint(model_save_path, state, metric=best_metric)
        else:
            patience += 1

        if patience >= max_patience:
            print("Early stopping! Patience is out.")
            break
        if etl[-1] < eps:
            print("Early stopping! Train loss < eps.")
            break

    return state, last["tl"], last["tm"], last["vl"], last["vm"]


def stratified_batch_indices(indices, labels):
    """Deterministic interleave of the minority class into sequential
    batches (reference `utils/routine.py:127-145`)."""
    indices = np.asarray(indices)
    labels = np.asarray(labels)
    dominating_label = np.atleast_1d(stats.mode(labels, keepdims=True)[0])[0]
    idx0 = indices[labels == dominating_label]
    idx1 = indices[labels != dominating_label]
    step = np.ceil(len(idx0) / len(idx1)) + 1
    assert step >= 1.0
    result = []
    j0 = j1 = 0
    for i in range(len(indices)):
        if (i % step == 0 or j0 == len(idx0)) and j1 < len(idx1):
            result.append(idx1[j1])
            j1 += 1
        else:
            result.append(idx0[j0])
            j0 += 1
    result = np.array(result)
    assert len(result) == len(indices)
    return result


def create_model_opt(model, sample_input, model_load_path: Optional[str] = None,
                     transfer: bool = False, lr: float = 1e-5,
                     weight_decay: float = 0.01, patience: int = 2,
                     head_name: str = "model__fully_conn_2", seed: int = 0):
    """Model/optimizer/scheduler factory (`classification/routine.py:253-279`
    semantics): deterministic seeding, Adam(+L2) with ReduceLROnPlateau
    (factor 0.5, rel threshold 1e-3); transfer mode freezes everything except
    a re-initialized classification head."""
    import optax

    rng = jax.random.key(seed)
    tx = torch_adam(lr, weight_decay=weight_decay)
    if transfer:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "train" if any(
                    getattr(p, "key", None) == head_name for p in path)
                else "freeze", params)

        tx = optax.multi_transform(
            {"train": torch_adam(lr, weight_decay=weight_decay),
             "freeze": optax.set_to_zero()}, label_fn)

    state = create_train_state(model, tx, sample_input, rng)
    if model_load_path is not None:
        if model_load_path.endswith(".pth"):
            from ..interop import import_torch_state_dict
            variables = import_torch_state_dict(state.variables,
                                                model_load_path, strict=False)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables.get("batch_stats"))
        else:
            state = load_checkpoint(model_load_path, state)
    if transfer:
        # fresh head on top of loaded features
        fresh = model.init(jax.random.key(seed + 1), sample_input)["params"]
        params = dict(state.params)
        if head_name in fresh:
            params[head_name] = fresh[head_name]
        state = state.replace(params=type(state.params)(params))
    scheduler = ReduceLROnPlateau(lr, mode="min", factor=0.5,
                                  patience=patience, threshold=1e-3)
    return state, scheduler


def cross_val_score(model, train_dataset, cv, metric, sample_input,
                    holdout_idx=None, model_load_path: Optional[str] = None,
                    batch_size: int = 10, val_dataset=None,
                    transfer: bool = False, finetune: bool = False,
                    experiment=None, max_epoch: int = 20, lr: float = 1e-5,
                    verbose: int = 0):
    """k-fold cross validation (`classification/routine.py:182-251`
    semantics). Returns per-fold validation metrics."""
    assert not (transfer and finetune)
    assert (not transfer) or (model_load_path is not None)

    use_rest = val_dataset is not None
    if val_dataset is None:
        val_dataset = train_dataset

    y_all = np.asarray(train_dataset.target)
    if holdout_idx is not None:
        cv_splits = list(cv.split(X=np.arange(len(holdout_idx)),
                                  y=y_all[np.asarray(holdout_idx)]))
    else:
        cv_splits = list(cv.split(X=np.arange(len(train_dataset)), y=y_all))

    val_metrics = []
    for train_idx, val_idx in cv_splits:
        do_train = model_load_path is None or transfer or finetune
        if do_train:
            train_idx = stratified_batch_indices(train_idx, y_all[train_idx])
            train_loader = DataLoader(Subset(train_dataset, train_idx),
                                      shuffle=False, batch_size=batch_size)
        if use_rest:
            val_mask = ~np.isin(np.asarray(val_dataset.pids),
                                np.asarray(train_dataset.pids)[train_idx])
            val_idx = np.arange(len(val_dataset))[val_mask]
        val_loader = DataLoader(Subset(val_dataset, val_idx), shuffle=False,
                                batch_size=batch_size)

        eps = 1e-2 if use_rest else 3e-3
        if do_train:
            state, scheduler = create_model_opt(
                model, sample_input,
                model_load_path if (transfer or finetune) else None,
                transfer=transfer, lr=lr)
            _, _, _, _, last_val_metric = train(
                state, train_loader, val_loader, metric, scheduler=scheduler,
                verbose=verbose, max_epoch=max_epoch, eps=eps,
                experiment=experiment)
            val_metrics.append(last_val_metric)
        else:
            state, _ = create_model_opt(model, sample_input, model_load_path,
                                        lr=lr)
            _, _, v_probs, v_targets = run_one_epoch(state, val_loader, False)
            if getattr(metric, "__name__", "") == "accuracy_score":
                val_metrics.append(metric(
                    v_targets, np.where(np.array(v_probs) <= 0.5, 0, 1)))
            else:
                val_metrics.append(metric(v_targets, v_probs))
    return val_metrics
