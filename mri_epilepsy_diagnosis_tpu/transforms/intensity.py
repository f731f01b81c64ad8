"""Intensity transforms — all jittable, operating on (..., D, H, W) or
channels-last volumes.

Numerics follow the torchio-derived implementations the reference depends on:

- `znormalization`: torchio ZNormalization, incl. the masking_method='mean'
  variant used by the segmentation notebooks.
- `histogram_standardization`: the Nyul-Udupa landmark method, numerics
  matched to the vendored numpy copy in `train_ENC_CLF.ipynb` cell 9
  (cutoff standardization, 13-landmark percentile grid, range_to_use
  sub-grid, per-bin linear maps with inf-guard on degenerate bins).
- `minmax_norm`: the detection pipeline's (x - min)/(max - min)
  (`detection/patch_utils.py:196`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

DEFAULT_CUTOFF = (0.01, 0.99)
STANDARD_RANGE = (0, 100)
# percentile grid: cutoffs + quartiles + deciles, sorted unique (13 values)
_RANGE_TO_USE = [0, 1, 2, 4, 5, 6, 7, 8, 10, 11, 12]


def _percentile_grid(cutoff=DEFAULT_CUTOFF) -> np.ndarray:
    c0 = min(max(cutoff[0], 0.0), 0.09)
    c1 = max(min(cutoff[1], 1.0), 0.91)
    pcts = sorted(set([100 * c0, 100 * c1] + [25, 50, 75]
                      + list(range(10, 100, 10))))
    return np.array(pcts, np.float64)


def znormalization(x, masking_method: Optional[str] = None, eps: float = 1e-9):
    """torchio ZNormalization: (x - mean[mask]) / std[mask].

    masking_method=None  -> whole-volume statistics
    masking_method='mean'-> mask = x > mean(x)  (ZNormalization.mean)
    """
    xf = x.astype(jnp.float32)
    if masking_method == "mean":
        mask = xf > jnp.mean(xf)
        n = jnp.sum(mask)
        mean = jnp.sum(jnp.where(mask, xf, 0)) / jnp.maximum(n, 1)
        var = jnp.sum(jnp.where(mask, jnp.square(xf - mean), 0)) / jnp.maximum(n, 1)
    else:
        mean = jnp.mean(xf)
        var = jnp.var(xf)
    return (xf - mean) / jnp.sqrt(var + eps)


def rescale_intensity(x, out_min_max: Tuple[float, float] = (0.0, 1.0),
                      percentiles: Tuple[float, float] = (0.0, 100.0)):
    """torchio RescaleIntensity: clamp to percentile window, scale linearly."""
    xf = x.astype(jnp.float32)
    lo = jnp.percentile(xf, percentiles[0])
    hi = jnp.percentile(xf, percentiles[1])
    xf = jnp.clip(xf, lo, hi)
    scale = (out_min_max[1] - out_min_max[0]) / jnp.maximum(hi - lo, 1e-9)
    return (xf - lo) * scale + out_min_max[0]


def minmax_norm(x):
    xf = x.astype(jnp.float32)
    lo, hi = jnp.min(xf), jnp.max(xf)
    return (xf - lo) / jnp.maximum(hi - lo, 1e-20)


def histogram_standardization(x, landmarks, cutoff=None, epsilon: float = 1e-5):
    """Nyul histogram standardization with trained `landmarks` (shape (13,)).

    Fully jittable: jnp.percentile (linear interpolation, identical to
    np.percentile) + searchsorted binning; numerics match the reference's
    numpy implementation.
    """
    shape = x.shape
    data = x.reshape(-1).astype(jnp.float32)
    mapping = jnp.asarray(landmarks, jnp.float32)

    pcts = _percentile_grid(DEFAULT_CUTOFF if cutoff is None else cutoff)
    perc_values = jnp.percentile(data, jnp.asarray(pcts, jnp.float32))

    range_idx = jnp.asarray(_RANGE_TO_USE)
    range_mapping = mapping[range_idx]
    range_perc = perc_values[range_idx]
    diff_mapping = jnp.diff(range_mapping)
    diff_perc = jnp.diff(range_perc)
    diff_perc = jnp.where(diff_perc < epsilon, jnp.inf, diff_perc)

    slopes = diff_mapping / diff_perc
    intercepts = range_mapping[:-1] - slopes * range_perc[:-1]

    # np.digitize(data, bins, right=False) == searchsorted(bins, data, 'right')
    bin_id = jnp.searchsorted(range_perc[1:-1], data, side="right")
    new = slopes[bin_id] * data + intercepts[bin_id]
    return new.reshape(shape)


def train_histogram_landmarks(volumes, cutoff=DEFAULT_CUTOFF,
                              masks=None) -> np.ndarray:
    """Train Nyul landmarks over a set of volumes (host-side, numpy) —
    the averaged-percentile mapping that produced the reference's shipped
    `fcd_train_data_landmarks.npy` (shape (13,))."""
    pcts = _percentile_grid(cutoff)
    db = []
    for i, vol in enumerate(volumes):
        v = np.asarray(vol, np.float32).reshape(-1)
        if masks is not None:
            v = v[np.asarray(masks[i]).reshape(-1)]
        db.append(np.percentile(v, pcts))
    db = np.stack(db)  # (num_images, 13)
    pc1, pc2 = db[:, 0], db[:, -1]
    s1, s2 = STANDARD_RANGE
    slopes = np.nan_to_num((s2 - s1) / (pc2 - pc1))
    intercepts = np.mean(s1 - slopes * pc1)
    return slopes.dot(db) / len(db) + intercepts
