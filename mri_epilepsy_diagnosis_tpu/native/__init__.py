"""Native (C++) host-side components, built on demand with the system
toolchain and loaded through ctypes.

The TPU compute path is JAX/XLA/Pallas; these are the host-runtime pieces
where the reference leaned on external native code (scipy.ndimage C
routines, FSL binaries — SURVEY.md §2.2):

- `edt3d`: exact anisotropic euclidean distance transform (the
  surface-distance metrics' hot host op).  Falls back to
  scipy.ndimage.distance_transform_edt when no compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC_DIR = os.path.dirname(__file__)
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_library() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    src = os.path.join(_SRC_DIR, "edt.cc")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "MRI_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "mri_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libmri_native_{digest}.so")
    if not os.path.exists(lib_path):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", lib_path + ".tmp", src]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(lib_path + ".tmp", lib_path)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(lib_path)
    lib.edt3d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.edt3d.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        _LIB = _build_library()
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def edt3d(mask, spacing=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Euclidean distance (physical units) to the nearest nonzero voxel.

    Matches scipy's `distance_transform_edt(~mask)`-style usage in reverse:
    this returns distance TO the mask, i.e.
    `scipy.ndimage.distance_transform_edt(~mask, sampling=spacing)`.
    """
    mask = np.ascontiguousarray(np.asarray(mask, dtype=np.uint8))
    if mask.ndim != 3:
        raise ValueError(f"edt3d expects a 3-D mask, got shape {mask.shape}")
    lib = _get_lib()
    if lib is None:
        from scipy import ndimage
        if not mask.any():
            return np.full(mask.shape, np.inf)
        return ndimage.distance_transform_edt(mask == 0, sampling=spacing)
    d, h, w = mask.shape
    out = np.empty((d, h, w), np.float64)
    sp = np.ascontiguousarray(np.asarray(spacing, np.float64))
    lib.edt3d(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
              d, h, w, sp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
              out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
