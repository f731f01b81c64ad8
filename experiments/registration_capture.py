"""Measure the registration capture range (VERDICT r3 weak #5).

Deform the real MNI152 gray template by increasing rigid misalignments and
register it back with (a) descent-from-identity (`search=False`, the r3
behavior) and (b) the FLIRT-style coarse global search stage
(`search=True`, the r4 default).  Records the angle where descent-only
silently lands in a bad optimum — the number quoted in
transforms/registration.py's module docstring.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python experiments/registration_capture.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mri_epilepsy_diagnosis_tpu.transforms import registration as R
from mri_epilepsy_diagnosis_tpu.utils.nifti import load_nifti

tpl = load_nifti(
    "/root/reference/detection/MNI152_T1_1mm_brain_gray.nii.gz").get_fdata()
tpl = tpl[::2, ::2, ::2].astype(np.float32)  # (91, 109, 91)


def ncc(a, b):
    a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
    return float((a @ b) / np.sqrt((a @ a) * (b @ b) + 1e-8))


CASES = [
    # label, (tx, ty, tz), (rx, ry, rz) degrees — compound tilts then the
    # clinically-misoriented extremes (axis quarter/half turns)
    *((f"tilt{d}", (8.0, -6.0, 5.0), (d, -0.6 * d, 0.4 * d))
      for d in (5, 10, 15, 20, 25, 30, 40, 60)),
    ("rot90z", (8.0, -6.0, 5.0), (0.0, 0.0, 90.0)),
    ("rot90x", (8.0, -6.0, 5.0), (90.0, 0.0, 0.0)),
    ("rot120z", (4.0, 0.0, 0.0), (0.0, 0.0, 120.0)),
    ("rot180z", (4.0, 0.0, 0.0), (0.0, 0.0, 180.0)),
    ("rot90x90z", (0.0, 0.0, 0.0), (90.0, 0.0, 90.0)),
]

only = sys.argv[1] if len(sys.argv) > 1 else None
print(f"template {tpl.shape}", flush=True)
for label, t, degs in CASES:
    if only and only not in label:
        continue
    r = np.deg2rad(np.asarray(degs, np.float64))
    true_params = jnp.asarray(list(t) + list(r) + [0.0] * 6, jnp.float32)
    fwd = R.params_to_affine(true_params, tpl.shape)
    subject = np.asarray(R.apply_transform(tpl, fwd, tpl.shape))
    row = [f"{label:10s} ncc_before={ncc(subject, tpl):+.3f}"]
    for search in (False, True):
        t0 = time.perf_counter()
        _, warped = R.register_affine(subject, tpl, dof=6, search=search)
        row.append(f"search={int(search)}: "
                   f"ncc={ncc(np.asarray(warped), tpl):+.3f}"
                   f" ({time.perf_counter() - t0:.0f}s)")
    print("  ".join(row), flush=True)
