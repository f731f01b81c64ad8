"""Volumetric overlap metrics.

`get_dice_score`/`get_dice_loss` match the reference's soft dice
(`segmentation/routine.py:239-253`: tp/fp/fn over spatial dims, eps=1e-9 in
the denominator) and are fully jittable; `get_iou_score` and
`compute_dice_coefficient` are the host-side numpy evaluation metrics
(`segmentation/routine.py:198-203`, `segmentation/metrics.py:312-329`).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_dice_score(output, target, spatial_dimensions=(2, 3, 4),
                   epsilon: float = 1e-9):
    """Soft dice per (batch, channel).

    `output`/`target`: probabilities and binary targets with the channel
    axis anywhere outside `spatial_dimensions` (the reference's NCDHW calls
    use the default (2,3,4); channels-last callers pass (1,2,3)).
    """
    p0 = output
    g0 = target
    p1 = 1 - p0
    g1 = 1 - g0
    tp = (p0 * g0).sum(axis=spatial_dimensions)
    fp = (p0 * g1).sum(axis=spatial_dimensions)
    fn = (p1 * g0).sum(axis=spatial_dimensions)
    return 2 * tp / (2 * tp + fp + fn + epsilon)


def get_dice_loss(output, target, spatial_dimensions=(2, 3, 4)):
    return 1 - get_dice_score(output, target, spatial_dimensions)


def get_iou_score(prediction, ground_truth) -> float:
    prediction = np.asarray(prediction)
    ground_truth = np.asarray(ground_truth)
    intersection = np.logical_and(prediction > 0, ground_truth > 0).sum()
    union = np.logical_or(prediction > 0, ground_truth > 0).sum()
    return float(intersection) / union


def compute_dice_coefficient(mask_gt, mask_pred) -> float:
    """Volumetric Dice; NaN when both masks are empty."""
    mask_gt = np.asarray(mask_gt).astype(bool)
    mask_pred = np.asarray(mask_pred).astype(bool)
    volume_sum = mask_gt.sum() + mask_pred.sum()
    if volume_sum == 0:
        return float("nan")
    return 2.0 * np.logical_and(mask_gt, mask_pred).sum() / volume_sum
