"""Label preparation — jittable ground-truth binarization.

Reference semantics (`segmentation/routine.py:185-196` `prepare_batch`):
subcortical FreeSurfer ids in LIST_FCD -> 1, cortical labels >= 1000 -> 1,
and values already equal to 1 stay 1 (the reference zeroes only
`targets != 1` at the end, so binary masks pass through unchanged);
everything else -> 0.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.data import LIST_FCD

_LIST_FCD_ARR = np.asarray(LIST_FCD, np.int32)


def binarize_segmentation(labels, list_fcd=None):
    """labels: any-shape array of FreeSurfer aseg+aparc ids (float or int)."""
    ids = jnp.asarray(_LIST_FCD_ARR if list_fcd is None else
                      np.asarray(list_fcd, np.int32))
    li = labels.astype(jnp.int32)
    is_sub = jnp.isin(li, ids)
    return ((is_sub | (li >= 1000) | (li == 1)).astype(jnp.float32))
