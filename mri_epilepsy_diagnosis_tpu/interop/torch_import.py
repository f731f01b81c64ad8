"""PyTorch `.pth` checkpoint import.

The reference ships trained weights that this framework must reproduce
bit-for-bit at the output level (BASELINE.md: Dice/AUC within 0.5%):

- `segmentation/weights/*.pth`          — fepegar UNet state dicts
- `classification/{encoder,clf,disc}_93_6_4.pth` — fader nets

Import strategy: model modules are *named* so that joining the flax param
path with '.' and rendering every double underscore as '.' yields exactly the
torch state-dict key (`encoding_blocks__0` -> `encoding_blocks.0`,
`block__1_convx` -> `block.1_convx`).  Arrays are then transposed by rank:

  rank 5 (conv3d / convtranspose3d): (O,I,kD,kH,kW) -> (kD,kH,kW,I,O)
  rank 4 (conv2d):                   (O,I,kH,kW)   -> (kH,kW,I,O)
  rank 2 (linear):                   (out,in)      -> (in,out)
  rank 0/1 (bias, norm stats, PReLU): unchanged

Extra torch keys (duplicated `block.N` aliases in fepegar checkpoints,
`num_batches_tracked`) are ignored.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch state dict into plain numpy arrays (CPU torch)."""
    import torch  # local import; only needed for interop

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _flax_path_to_torch_key(path) -> str:
    return ".".join(comp.replace("__", ".") for comp in path)


def _convert(arr: np.ndarray, target_shape) -> np.ndarray:
    if arr.ndim == 5:
        arr = arr.transpose(2, 3, 4, 1, 0)
    elif arr.ndim == 4:
        arr = arr.transpose(2, 3, 1, 0)
    elif arr.ndim == 2:
        arr = arr.transpose(1, 0)
    if tuple(arr.shape) != tuple(target_shape):
        raise ValueError(
            f"shape mismatch after transpose: torch {arr.shape} vs flax {tuple(target_shape)}")
    return np.ascontiguousarray(arr)


def import_torch_state_dict(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray] | str,
    *,
    strip_prefix: str = "",
    key_map: Mapping[str, str] | None = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax `variables` pytree (params + batch_stats) from a torch
    state dict (or a path to one).  Returns a new variables dict.

    `key_map` optionally overrides the derived torch key for given flax
    paths (joined with '.').
    """
    if isinstance(state_dict, str):
        state_dict = load_torch_checkpoint(state_dict)
    if strip_prefix:
        state_dict = {
            (k[len(strip_prefix):] if k.startswith(strip_prefix) else k): v
            for k, v in state_dict.items()
        }

    flat = flatten_dict(unfreeze(variables))
    out = {}
    missing = []
    for path, val in flat.items():
        # drop the collection name ('params' / 'batch_stats') from the key
        tkey = _flax_path_to_torch_key(path[1:])
        if key_map and tkey in key_map:
            tkey = key_map[tkey]
        if tkey in state_dict:
            out[path] = jnp.asarray(
                _convert(np.asarray(state_dict[tkey]), np.shape(val)),
                dtype=jnp.asarray(val).dtype)
        else:
            missing.append(tkey)
            out[path] = val
    if strict and missing:
        raise KeyError(f"torch checkpoint missing {len(missing)} keys, e.g. {missing[:5]}")
    return unflatten_dict(out)
