"""TPU-native framework for FCD MRI detection / segmentation / classification.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
`kondratevakate/mri-epilepsy-diagnosis` (see SURVEY.md at the repo root):

- ``utils``       NIfTI I/O (own codec), manifest assembly, dataset classes
- ``transforms``  fused jit'd preprocessing / augmentation graph
- ``ops``         TPU conv/pool/resize primitives + Pallas kernels
- ``models``      UNet3D (checkpoint-parity), fader AE family, CNN zoo,
                  detection patch CNN, Bayesian conv variants
- ``train``       functional pjit train steps, epoch drivers, CV harness
- ``metrics``     in-graph dice/IoU + host surface-distance suite
- ``infer``       batched sliding-window whole-brain inference
- ``parallel``    mesh construction, sharded train steps, spatial partitioning
- ``interop``     PyTorch ``.pth`` checkpoint import
- ``obs``         metric logging / profiling hooks
- ``data``        host-side input pipeline (prefetch, patch queue)
"""

__version__ = "0.1.0"

# Keep top-level import light: subpackages are imported on demand.
__all__ = [
    "core", "ops", "models", "parallel", "utils", "transforms",
    "train", "metrics", "infer", "interop", "obs", "data",
]
