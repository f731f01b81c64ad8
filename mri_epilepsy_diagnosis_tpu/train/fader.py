"""Fader-network adversarial training: GAN-style alternation of a domain
discriminator against an encoder(+classifier or +decoder).

Capability-parity with the reference's notebook loops (`train_AE.ipynb`
cells 6-7, `train_ENC_CLF.ipynb` cells 14/16/18):

- discriminator step: CE over scanner domains on the *frozen* encoder's
  latent, repeated `disc_loop` times (3 while epoch < 5, then 1);
- encoder step: `main + lambda(t) * adv` where adv pushes the (frozen)
  discriminator toward the *wrong* domains via the reversed one-hot
  log-softmax mean; `main` is weighted CE (ENC_CLF) or MSE reconstruction
  (AE); lambda ramps linearly `lambda_initial -> lambda_final` over
  `max_step` optimizer steps.

The torch `requires_grad` flag-flipping is replaced by the functional
structure itself: each jitted step differentiates only its own parameter
subtree, so the other network is frozen by construction.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .classification import cross_entropy
from .state import TrainState


def adv_loss(domains, pred_logits, n_domains: int):
    """-mean over the (batch, n_domains) matrix of reversed-one-hot *
    log-softmax (reference `adv_loss`, train_ENC_CLF.ipynb cell 14)."""
    onehot = jax.nn.one_hot(domains, n_domains)
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    return -jnp.mean((1.0 - onehot) * logp)


def fader_main_loss(clf_logits, y, disc_logits, domains, lambda_t,
                    n_domains: int, class_weight=None):
    loss_clf = cross_entropy(clf_logits, y, weight=class_weight)
    loss_adv = adv_loss(domains, disc_logits, n_domains)
    return loss_clf + lambda_t * loss_adv, loss_adv


@flax.struct.dataclass
class FaderState:
    encoder: TrainState
    clf: Optional[TrainState]
    disc: TrainState
    decoder: Optional[TrainState] = None


def _apply(state: TrainState, params, x, train, rng):
    variables = {"params": params}
    rngs = {"dropout": rng, "sample": rng}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
        if train:
            y, new_vars = state.apply_fn(variables, x, train=train, rngs=rngs,
                                         mutable=["batch_stats"])
            return y, new_vars.get("batch_stats")
    return state.apply_fn(variables, x, train=train, rngs=rngs), state.batch_stats


@functools.partial(jax.jit, static_argnames=("n_domains",), donate_argnums=(0,))
def disc_step(fstate: FaderState, x, domains, rng, n_domains: int,
              domain_weight=None):
    """Train disc on the frozen encoder's latent (encoder in eval mode, as
    the reference calls `ae.eval()` during disc updates)."""
    (latent, _sizes), _ = _apply(fstate.encoder, fstate.encoder.params, x,
                                 False, rng)
    latent = jax.lax.stop_gradient(latent)

    def loss_fn(disc_params):
        logits, bs = _apply(fstate.disc, disc_params, latent, True, rng)
        return cross_entropy(logits, domains, weight=domain_weight), (logits, bs)

    (loss, (logits, bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(fstate.disc.params)
    new_disc = fstate.disc.apply_gradients(grads, new_batch_stats=bs)
    return fstate.replace(disc=new_disc), loss, logits


@functools.partial(jax.jit, static_argnames=("n_domains",), donate_argnums=(0,))
def enc_clf_step(fstate: FaderState, x, y, domains, lambda_t, rng,
                 n_domains: int, class_weight=None):
    """Train encoder+classifier against the frozen discriminator."""

    def loss_fn(enc_params, clf_params):
        (latent, _sizes), enc_bs = _apply(fstate.encoder, enc_params, x,
                                          True, rng)
        clf_logits, clf_bs = _apply(fstate.clf, clf_params, latent, True, rng)
        disc_logits, _ = _apply(fstate.disc, fstate.disc.params, latent,
                                False, rng)
        loss, loss_adv = fader_main_loss(clf_logits, y, disc_logits, domains,
                                         lambda_t, n_domains, class_weight)
        return loss, (loss_adv, clf_logits, enc_bs, clf_bs)

    (loss, (loss_adv, clf_logits, enc_bs, clf_bs)), grads = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            fstate.encoder.params, fstate.clf.params))
    new_enc = fstate.encoder.apply_gradients(grads[0], new_batch_stats=enc_bs)
    new_clf = fstate.clf.apply_gradients(grads[1], new_batch_stats=clf_bs)
    return (fstate.replace(encoder=new_enc, clf=new_clf), loss, loss_adv,
            clf_logits)


@functools.partial(jax.jit, donate_argnums=(0,))
def ae_step(fstate: FaderState, x, domains, lambda_t, rng):
    """AE variant (train_AE.ipynb): MSE reconstruction + lambda * adv."""

    def loss_fn(enc_params, dec_params):
        (latent, sizes), enc_bs = _apply(fstate.encoder, enc_params, x, True, rng)
        rec, dec_bs = _apply_decoder(fstate.decoder, dec_params, latent,
                                     sizes, rng)
        disc_logits, _ = _apply(fstate.disc, fstate.disc.params, latent,
                                False, rng)
        nd = disc_logits.shape[-1]
        loss = (jnp.mean(jnp.square(rec - x))
                + lambda_t * adv_loss(domains, disc_logits, nd))
        return loss, (enc_bs, dec_bs)

    (loss, (enc_bs, dec_bs)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(
            fstate.encoder.params, fstate.decoder.params)
    new_enc = fstate.encoder.apply_gradients(grads[0], new_batch_stats=enc_bs)
    new_dec = fstate.decoder.apply_gradients(grads[1], new_batch_stats=dec_bs)
    return fstate.replace(encoder=new_enc, decoder=new_dec), loss


def _apply_decoder(state: TrainState, params, latent, sizes, rng):
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
        y, new_vars = state.apply_fn(variables, latent, sizes, train=True,
                                     rngs={"dropout": rng},
                                     mutable=["batch_stats"])
        return y, new_vars.get("batch_stats")
    return (state.apply_fn(variables, latent, sizes, train=True,
                           rngs={"dropout": rng}), None)


def train_fader(fstate: FaderState, train_loader, val_loader, epochs: int,
                lambda_initial: float, lambda_step: float, max_step: int,
                n_domains: int, disc_loop: int = 1, class_weight=None,
                domain_weight=None, experiment=None, verbose: bool = True,
                rng_seed: int = 0, dashboard=None, input_dtype=None):
    """ENC_CLF epoch driver (train_ENC_CLF.ipynb cell 16 semantics).

    Returns (fstate, history dict with per-epoch accuracy / roc_auc /
    domain accuracy and losses).

    `input_dtype=jnp.bfloat16` trains mixed precision (bf16 activations,
    f32 master weights/optimizer moments — the seg-loop `input_dtype`
    contract, train/seg.py:132): on TPU the 192^3 alternation runs 25.4
    vs 22.9 vol/s f32 (experiments/aux_bf16_probe.py, round 3)."""
    from sklearn.metrics import accuracy_score, roc_auc_score

    key = jax.random.key(rng_seed)
    step = 0
    lambda_t = lambda_initial
    hist = {k: [] for k in ["train_loss", "train_loss_disc", "train_loss_adv",
                            "val_loss", "val_loss_disc", "acc_train",
                            "roc_train", "acc_domain_train", "acc", "roc",
                            "acc_domain"]}

    cw = None if class_weight is None else jnp.asarray(class_weight, jnp.float32)
    dw = None if domain_weight is None else jnp.asarray(domain_weight, jnp.float32)

    for epoch in range(epochs):
        t0 = time.time()
        n_d = disc_loop if epoch < 5 else 1
        pred_tr, gt_tr, pred_dom, gt_dom = [], [], [], []

        for batch in train_loader:
            x = jnp.asarray(batch[0])
            if input_dtype is not None:
                x = x.astype(input_dtype)
            y = jnp.asarray(np.asarray(batch[1]), jnp.int32)
            dom = jnp.asarray(np.asarray(batch[2]), jnp.int32)
            for _ in range(n_d):
                key, sub = jax.random.split(key)
                fstate, loss_disc, disc_logits = disc_step(
                    fstate, x, dom, sub, n_domains, dw)
            pred_dom.extend(np.argmax(np.asarray(disc_logits), -1).tolist())
            gt_dom.extend(np.asarray(dom).tolist())

            key, sub = jax.random.split(key)
            fstate, loss, loss_adv, clf_logits = enc_clf_step(
                fstate, x, y, dom, jnp.float32(lambda_t), sub, n_domains, cw)
            pred_tr.extend(np.argmax(np.asarray(clf_logits), -1).tolist())
            gt_tr.extend(np.asarray(y).tolist())

            step += 1
            if step < max_step:
                lambda_t += lambda_step

            hist["train_loss"].append(float(loss))
            hist["train_loss_disc"].append(float(loss_disc))
            hist["train_loss_adv"].append(float(loss_adv))
            if experiment:
                experiment.log_metrics({"train_loss": float(loss),
                                        "train_loss_disc": float(loss_disc),
                                        "lambda": lambda_t}, step=step)

        hist["acc_train"].append(accuracy_score(gt_tr, pred_tr))
        hist["acc_domain_train"].append(accuracy_score(gt_dom, pred_dom))
        try:
            hist["roc_train"].append(roc_auc_score(gt_tr, pred_tr))
        except ValueError:
            hist["roc_train"].append(float("nan"))

        # validation
        if val_loader is not None:
            pred, gt, pred_d, gt_d = [], [], [], []
            for batch in val_loader:
                x = jnp.asarray(batch[0])
                if input_dtype is not None:
                    x = x.astype(input_dtype)
                y = np.asarray(batch[1])
                dom = np.asarray(batch[2])
                key, sub = jax.random.split(key)
                (latent, _), _ = _apply(fstate.encoder, fstate.encoder.params,
                                        x, False, sub)
                clf_logits, _ = _apply(fstate.clf, fstate.clf.params, latent,
                                       False, sub)
                disc_logits, _ = _apply(fstate.disc, fstate.disc.params,
                                        latent, False, sub)
                pred.extend(np.argmax(np.asarray(clf_logits), -1).tolist())
                gt.extend(y.tolist())
                pred_d.extend(np.argmax(np.asarray(disc_logits), -1).tolist())
                gt_d.extend(dom.tolist())
            hist["acc"].append(accuracy_score(gt, pred))
            hist["acc_domain"].append(accuracy_score(gt_d, pred_d))
            try:
                hist["roc"].append(roc_auc_score(gt, pred))
            except ValueError:
                hist["roc"].append(float("nan"))

        if dashboard is not None:  # 12-panel live redraw per epoch
            dashboard.update(hist)
        if verbose:
            print(f"epoch {epoch}: {time.time() - t0:.1f}s "
                  f"train acc {hist['acc_train'][-1]:.3f} "
                  f"domain acc {hist['acc_domain_train'][-1]:.3f}"
                  + (f" val acc {hist['acc'][-1]:.3f}" if val_loader else ""))
    return fstate, hist
