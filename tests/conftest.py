"""Test configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so every multi-chip
sharding path (data-parallel pjit, spatial partitioning with halo exchange)
is exercised without TPU hardware — the TPU-world equivalent of a fake
distributed backend (SURVEY.md §4).

Must set env vars before jax is imported anywhere.
"""
import os

# Force CPU even when the session env pins a TPU platform (JAX_PLATFORMS=axon
# in this image): the suite must exercise the 8-device mesh paths.  The
# image's sitecustomize imports jax at interpreter start, so the env var is
# already frozen — override through jax.config before backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
