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

# Persistent CPU-ONLY compilation cache: the suite's wall clock is almost
# entirely XLA CPU compiles (durations r4: 3279 s total, every top entry
# compile-bound), repeated identically on every run and in every child
# process (isolated tests, example subprocesses, multihost workers).  A
# separate dir from the TPU relay cache on purpose — reloading an
# executable persisted by a DIFFERENT backend segfaults
# (deserialize_executable, see __graft_entry__); same-platform CPU
# reloads are safe and turn steady-state suite runs from ~55 min into
# minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/mri_tpu_test_cpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# ... and as env vars so every CHILD process (example-script subprocesses,
# isolated tests, multihost workers — all forced-CPU) shares the same
# cache.  A TPU context never sees this dir: __graft_entry__/bench call
# enable_compilation_cache(), whose explicit config override wins.
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/mri_tpu_test_cpu_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"

import subprocess
import sys
import time

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_state():
    """Release compiled executables after every test module.

    Two full-suite runs (r3 + r4) died with a segfault inside XLA's CPU
    `backend_compile_and_load` after ~200 accumulated in-process compiles
    — at DIFFERENT tests (test_packed_seg_training_loop, then
    test_fader_training_steps once the first was subprocess-isolated), so
    the trigger is total live compile state, not any one graph.  Clearing
    jax's caches per module frees the executables (and their LLVM JIT
    memory), bounding the live set to one module's worth."""
    yield
    jax.clear_caches()


# ---------------------------------------------------------------------------
# subprocess isolation for compile-heavy tests (VERDICT r3 ask #1)
#
# One full-suite run in round 3 died with a Python segfault at ~81% inside
# an XLA CPU compile (`backend_compile_and_load`), with the same test
# passing in isolation and on rerun: hundreds of in-process XLA compiles
# accumulate state until a rare in-process crash kills the whole run.
# Fork-based isolation deadlocks (jax is multithreaded), so tests marked
# `@pytest.mark.isolated` run in a FRESH interpreter via a child pytest —
# a crash there fails one test instead of the suite, and the parent
# process's compile count stays bounded.
# ---------------------------------------------------------------------------

_ISOLATED_CHILD_ENV = "MRI_TPU_ISOLATED_CHILD"


def pytest_runtest_protocol(item, nextitem):
    if (item.get_closest_marker("isolated") is None
            or os.environ.get(_ISOLATED_CHILD_ENV)):
        return None

    item.ihook.pytest_runtest_logstart(nodeid=item.nodeid,
                                       location=item.location)
    env = dict(os.environ, **{_ISOLATED_CHILD_ENV: "1"})
    start = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", item.nodeid, "-q",
             "-p", "no:cacheprovider", "--no-header"],
            capture_output=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, timeout=1800)
        rc, out = proc.returncode, (proc.stdout + proc.stderr).decode(
            errors="replace")
    except subprocess.TimeoutExpired as e:
        rc, out = -1, f"isolated test timed out after 1800s\n{e}"
    duration = time.time() - start

    from _pytest.reports import TestReport

    tail = out.splitlines()[-1] if out.splitlines() else ""
    if rc == 0 and " skipped" in tail and " passed" not in tail:
        outcome, longrepr = "skipped", (item.location[0], item.location[1],
                                        f"skipped in child: {tail}")
    elif rc == 0:
        outcome, longrepr = "passed", None
    else:
        outcome = "failed"
        longrepr = (f"isolated child pytest exited rc={rc} "
                    f"(negative = killed by signal, e.g. a compile "
                    f"segfault)\n{out[-8000:]}")
    report = TestReport(nodeid=item.nodeid, location=item.location,
                        keywords={item.name: 1}, outcome=outcome,
                        longrepr=longrepr, when="call", sections=[],
                        duration=duration, start=start, stop=start + duration)
    item.ihook.pytest_runtest_logreport(report=report)
    item.ihook.pytest_runtest_logfinish(nodeid=item.nodeid,
                                        location=item.location)
    # The normal protocol ends with SetupState.teardown_exact(nextitem),
    # which pops finalizers (e.g. the previous module's module-scoped
    # fixtures) down to the common ancestor.  Skipping it leaves the
    # runner's stack inconsistent and the NEXT item errors at setup with
    # "previous item was not torn down properly".
    item.session._setupstate.teardown_exact(nextitem)
    return True


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)
