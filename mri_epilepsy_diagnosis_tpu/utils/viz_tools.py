"""Visualization helpers (capability-parity with `utils/viz_tools.py`):
central triplanar cuts, prediction overlay, and difference plots.

Accept numpy arrays, jax arrays, or NiftiImage; shapes (D,H,W), (C,D,H,W)
or (N,C,D,H,W) — the leading dims are stripped like the reference does for
torch tensors.  Uses the non-interactive Agg backend when no display exists.
"""
from __future__ import annotations

import numpy as np

from .nifti import NiftiImage


def _as_volume(img) -> np.ndarray:
    if isinstance(img, NiftiImage):
        img = img.get_fdata()
    img = np.asarray(img)
    while img.ndim > 3:
        img = img[0]
    return img


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_central_cuts(img, title: str = "", save_path=None):
    img = _as_volume(img)
    plt = _plt()
    fig, axes = plt.subplots(nrows=1, ncols=3, figsize=(3 * 4, 4))
    axes[0].imshow(img[img.shape[0] // 2, :, :])
    axes[1].imshow(img[:, img.shape[1] // 2, :])
    axes[2].imshow(img[:, :, img.shape[2] // 2])
    if title:
        fig.suptitle(title)
    if save_path:
        fig.savefig(save_path)
    plt.close(fig)
    return fig


def plot_predicted(img, seg, delta: int = 0, title: str = "", save_path=None):
    img, seg = _as_volume(img), _as_volume(seg).astype(np.uint8)
    plt = _plt()
    fig, axes = plt.subplots(nrows=1, ncols=3, figsize=(3 * 4, 4))
    c = img.shape[0] // 2 + delta
    axes[0].imshow(img[c, :, :])
    axes[1].imshow(seg[seg.shape[0] // 2 + delta, :, :])
    axes[2].imshow(img[c, :, :] + seg[seg.shape[0] // 2 + delta, :, :] * 100,
                   cmap="gray")
    if save_path:
        fig.savefig(save_path)
    plt.close(fig)
    return fig


def plot_difference(img, seg, delta: int = 0, title: str = "", save_path=None):
    img, seg = _as_volume(img), _as_volume(seg).astype(np.uint8)
    plt = _plt()
    fig, axes = plt.subplots(nrows=1, ncols=3, figsize=(3 * 4, 4))
    c = img.shape[0] // 2 + delta
    axes[0].imshow(img[c, :, :])
    axes[1].imshow(seg[seg.shape[0] // 2 + delta, :, :])
    axes[2].imshow((img[c, :, :] - seg[seg.shape[0] // 2 + delta, :, :]) * 100,
                   cmap="gray")
    if save_path:
        fig.savefig(save_path)
    plt.close(fig)
    return fig
