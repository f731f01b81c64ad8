"""Test configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so every multi-chip
sharding path (data-parallel pjit, spatial partitioning with halo exchange)
is exercised without TPU hardware — the TPU-world equivalent of a fake
distributed backend (SURVEY.md §4).

Must set env vars before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)
