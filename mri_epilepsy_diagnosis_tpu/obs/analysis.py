"""Latent-space analysis: t-SNE / PCA of fader embeddings.

Capability-parity with `train_ENC_CLF.ipynb` cells 15/30-32: collect encoder
latents and the discriminator/classifier hidden embeddings over a loader
(batched device calls), then t-SNE them colored by scanner domain.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp


def collect_latents(encoder_apply, enc_vars, loader, disc_apply=None,
                    disc_vars=None, clf_apply=None, clf_vars=None):
    """Returns dict with 'encoder' (flattened latents), optional 'disc' and
    'clf' hidden embeddings, plus 'domains' and 'targets'."""
    lat_e, lat_d, lat_c, doms, ys = [], [], [], [], []
    for batch in loader:
        x = jnp.asarray(batch[0])
        latent, _sizes = encoder_apply(enc_vars, x)
        lat_e.append(np.asarray(latent).reshape(latent.shape[0], -1))
        if disc_apply is not None:
            _, hid = disc_apply(disc_vars, latent, False, True)
            lat_d.append(np.asarray(hid))
        if clf_apply is not None:
            _, hid = clf_apply(clf_vars, latent, False, True)
            lat_c.append(np.asarray(hid))
        ys.append(np.asarray(batch[1]))
        doms.append(np.asarray(batch[2]))
    out = {"encoder": np.concatenate(lat_e),
           "targets": np.concatenate(ys),
           "domains": np.concatenate(doms)}
    if lat_d:
        out["disc"] = np.concatenate(lat_d)
    if lat_c:
        out["clf"] = np.concatenate(lat_c)
    return out


def tsne_embed(features, n_components: int = 2, random_state: int = 42,
               learning_rate: float = 50.0, n_iter: int = 2000):
    """sklearn t-SNE with the reference's hyperparameters."""
    from sklearn import manifold

    tsne = manifold.TSNE(n_components=n_components, max_iter=n_iter,
                         learning_rate=learning_rate, verbose=0,
                         random_state=random_state)
    return tsne.fit_transform(np.asarray(features))


def pca_embed(features, n_components: int = 2):
    from sklearn.decomposition import PCA

    return PCA(n_components=n_components).fit_transform(np.asarray(features))


def tsne_plot(latents: dict, keys=None, save_path: Optional[str] = None):
    """Triptych of encoder/disc/clf t-SNEs colored by scanner domain
    (reference `tsne_plot`)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib import cm

    panels = [k for k in ("encoder", "disc", "clf") if k in latents]
    embeds = {k: tsne_embed(latents[k]) for k in panels}
    z = latents["domains"]
    fig, axes = plt.subplots(1, len(panels), figsize=(8 * len(panels), 8),
                             constrained_layout=True, squeeze=False)
    for ax, k in zip(axes[0], panels):
        ax.set_title(f"{k} TSNE")
        for ci, c in enumerate(sorted(set(z.tolist()))):
            idx = np.where(z == c)[0]
            label = keys[c] if keys is not None else str(c)
            ax.scatter(embeds[k][idx, 0], embeds[k][idx, 1], s=10,
                       edgecolor="none", label=label,
                       color=cm.tab20(int(ci)))
    axes[0][-1].legend(loc=2, bbox_to_anchor=(1, 1), markerscale=5)
    if save_path:
        fig.savefig(save_path, dpi=50)
    plt.close(fig)
    return embeds
