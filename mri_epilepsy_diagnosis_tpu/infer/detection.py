"""Whole-brain FCD detection inference.

Capability-parity with `detection/model_utils.py:118-246` (reference
`FCDMaskGenerator`), redesigned for TPU: the reference issues one GPU call
per patch (~8.7k single-sample forward passes per brain,
`_infer_patch`/`_get_predictions_per_batches`); here every patch of the
volume is extracted on host (vectorized band walk) and classified in a
handful of large batched device calls — the single most TPU-batchable
workload in the reference (SURVEY.md §3.5).

Post-processing keeps reference numerics: cross-kernel neighbor-count
smoothing over the patch map (flip isolated labels), then voxel
back-projection of band/column windows into the final mask.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.patches import _band_geometry, iter_band_patches
from ..utils.nifti import NiftiImage, load_nifti, save_nifti


class FCDMaskGenerator:
    """apply_fn(variables, patches_(B,h,w,2)) -> logits (B,2)."""

    def __init__(self, apply_fn: Callable, variables, gmpm: np.ndarray,
                 h: int = 16, w: int = 32, batch_size: int = 512):
        self.apply_fn = apply_fn
        self.variables = variables
        self.gmpm = np.asarray(gmpm)
        self.h = h
        self.w = w
        self.batch_size = batch_size
        self._jit_apply = jax.jit(apply_fn)

    # -- patch inference ----------------------------------------------------

    def _collect_patches(self, img):
        """All patches + their (kind, band, slice) destinations — one band
        walk shared with training extraction (`data/patches.iter_band_patches`)
        so training and inference geometry can never diverge."""
        patches, dests = [], []
        for i, band, kind, patch, _label in iter_band_patches(
                img, self.gmpm, None, self.h, self.w):
            patches.append(patch)
            dests.append((kind, band, i))
        return (np.stack(patches).astype(np.float32), np.asarray(dests))

    def _get_predictions_per_batches(self, img) -> np.ndarray:
        """(4, n_bands, n_slices) predicted patch labels, one device call per
        `batch_size` patches instead of one per patch."""
        patches, dests = self._collect_patches(img)
        # channels-last for the 2D CNN: (B, h, w, 2)
        x = np.moveaxis(patches, 1, -1)
        n = len(x)
        pad = (-n) % self.batch_size
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        labels = []
        for start in range(0, len(x), self.batch_size):
            logits = self._jit_apply(self.variables,
                                     jnp.asarray(x[start:start + self.batch_size]))
            labels.append(np.argmax(np.asarray(logits), axis=-1))
        labels = np.concatenate(labels)[:n]

        pmt = np.zeros((4, self.gmpm.shape[1] // self.h, self.gmpm.shape[2]),
                       np.int64)
        pmt[dests[:, 0], dests[:, 1], dests[:, 2]] = labels
        return pmt

    # -- post-processing ----------------------------------------------------

    @staticmethod
    def _postprocess(patch_map_tensor: np.ndarray) -> np.ndarray:
        """Cross-kernel neighbor vote (reference `_postprocess`): a cell with
        all four in-plane neighbors set becomes 1; with none set becomes 0."""
        p = patch_map_tensor.astype(np.float64)
        res = np.zeros_like(p)
        res[:, 1:, :] += p[:, :-1, :]
        res[:, :-1, :] += p[:, 1:, :]
        res[:, :, 1:] += p[:, :, :-1]
        res[:, :, :-1] += p[:, :, 1:]
        res *= 0.25
        out = patch_map_tensor.copy()
        out[res == 1.0] = 1
        out[res == 0.0] = 0
        return out

    def _masking(self, img, patch_map_tensor) -> np.ndarray:
        """Back-project patch labels into a voxel mask (reference `_masking`
        index arithmetic, incl. the rot90-inverse row band `-j : -j-h : -1`)."""
        h, w = self.h, self.w
        final_mask = np.zeros_like(img)
        for i in range(self.gmpm.shape[2]):
            sg = np.rot90(self.gmpm[:, :, i])
            for j in range(0, self.gmpm.shape[1], h):
                geo = _band_geometry(sg, j, h, w)
                if geo is None:
                    continue
                start_idx, mid_idx = geo
                # exact reference slice `-j : -j-h : -1`; NB for j == 0 this
                # is empty (top band never back-projected) — bug-compatible.
                rows = slice(-j, -j - h, -1)
                if start_idx < mid_idx:
                    final_mask[start_idx:start_idx + w, rows, i] = \
                        patch_map_tensor[0, j // h, i]
                    final_mask[-start_idx - w:-start_idx, rows, i] = \
                        patch_map_tensor[3, j // h, i]
                final_mask[mid_idx:mid_idx + w, rows, i] = \
                    patch_map_tensor[1, j // h, i]
                final_mask[-mid_idx - w:-mid_idx, rows, i] = \
                    patch_map_tensor[2, j // h, i]
        return final_mask

    # -- public API ---------------------------------------------------------

    def get_mask(self, img) -> np.ndarray:
        pmt = self._get_predictions_per_batches(img)
        pmt = self._postprocess(pmt)
        return self._masking(img, pmt).astype(np.int64)

    @staticmethod
    def get_iou(pred_mask, true_mask) -> float:
        assert pred_mask.shape == true_mask.shape, "Wrong shape of masks"
        intersection = np.logical_and(pred_mask, true_mask)
        union = np.logical_or(pred_mask, true_mask)
        return intersection.sum() / union.sum()

    @staticmethod
    def save_nii_mask(mask, img: NiftiImage, name: str = "pred_mask.nii.gz"):
        save_nifti(name, np.asarray(mask), img.affine)

    def inference_pipeline(self, input_img_name: str,
                           input_mask_name: Optional[str] = None,
                           out_name: str = "pred_mask.nii.gz"):
        img = load_nifti(input_img_name)
        img_np = img.get_fdata()
        img_np = (img_np - img_np.min()) / (img_np.max() - img_np.min())
        pred_mask_np = self.get_mask(img_np)
        iou = None
        if input_mask_name is not None:
            true_mask_np = load_nifti(input_mask_name).get_fdata() > 0
            iou = self.get_iou(pred_mask_np, true_mask_np)
            print(f"Intersection over union = {iou:.5f}")
        self.save_nii_mask(pred_mask_np, img, out_name)
        return pred_mask_np, iou
