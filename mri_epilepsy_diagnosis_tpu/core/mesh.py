"""Device mesh construction and canonical shardings.

The reference has no distributed runtime at all (SURVEY.md §2.3 — single GPU,
the only multi-device code is a manual 2-stage encoder/decoder split,
`segmentation/models/3d_bayes_unet.py:45-66`).  The TPU-native design scales
through a `jax.sharding.Mesh` instead:

- axis ``data``    — batch (data parallelism; grad all-reduce rides ICI)
- axis ``spatial`` — D-axis spatial partitioning of whole volumes with halo
                     exchange (the volume-size analog of sequence parallelism)

Meshes are cheap to construct; every train/infer entry point takes an optional
mesh and defaults to all local devices on the ``data`` axis.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return len(jax.devices())


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host (DCN) entry point: `jax.distributed.initialize` guarded so
    single-process runs (this image: one tunneled chip) are a no-op.

    On a real multi-host pod slice each host calls this before any jax op;
    afterwards `jax.devices()` is global, `jax.local_devices()` per-host,
    and `create_mesh(..., multi_host=True)` lays the global mesh out with
    the data axis outermost so its collectives ride DCN only between hosts
    while spatial halo exchanges stay on intra-slice ICI (SURVEY.md §2.3).
    Returns True when a multi-process runtime was actually initialized.
    """
    if num_processes in (None, 0, 1) and coordinator_address is None:
        return False  # single-process: nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_batch_bounds(global_batch: int, num_hosts: int | None = None,
                         host_id: int | None = None) -> tuple[int, int]:
    """[start, stop) of the global batch this host must feed when the batch
    dim is sharded over a data axis laid out host-major.

    Pure arithmetic (unit-testable without real hosts): requires
    `global_batch` divisible by `num_hosts` — jax global arrays need equal
    per-host addressable shards.
    """
    if num_hosts is None:
        num_hosts = jax.process_count()
    if host_id is None:
        host_id = jax.process_index()
    if global_batch % num_hosts:
        raise ValueError(
            f"global batch {global_batch} not divisible by {num_hosts} "
            f"hosts: every host must contribute an equal shard")
    per = global_batch // num_hosts
    return host_id * per, (host_id + 1) * per


def host_local_batch(global_array, mesh: Mesh, sharding=None):
    """Build a global jax.Array for `global_array`'s batch dim from THIS
    host's slice only (multi-host input pipeline: each host loads just the
    rows `process_batch_bounds` assigns it).

    Single-process: equivalent to `jax.device_put(x, sharding)`.  The
    caller passes the FULL global array in single-process runs and only its
    local rows in multi-process runs (standard per-host input sharding).
    """
    if sharding is None:
        sharding = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(jax.numpy.asarray(global_array), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(global_array))


def wait_for_backend(max_wait_s: float = 1200, probe_timeout_s: float = 150,
                     retry_sleep_s: float = 60, _probe_cmd=None) -> bool:
    """Block until the accelerator backend initializes, retrying through
    transient transport outages.

    The tunneled TPU backend on this platform can report ``UNAVAILABLE: TPU
    backend setup/compile error`` for 30+ minute stretches.  A bare
    ``jax.devices()`` during such a window either hangs or raises — and a
    failed in-process init can be cached by the PJRT plugin — so the probe
    runs in a subprocess and the caller's process first touches the backend
    only after a probe succeeds.  Returns True if the backend came up,
    False after ``max_wait_s`` (callers may then proceed and surface the
    real in-process error).
    """
    import subprocess
    import sys
    import time

    if _probe_cmd is None:
        # an in-process jax.config.update("jax_platforms", "cpu") (how CPU
        # smokes override the image's pinned axon env) is NOT inherited by
        # a subprocess — the probe would wait on the tunnel the caller
        # isn't going to use.  CPU-only configs need no wait at all.
        platforms = getattr(jax.config, "jax_platforms", None) or ""
        if platforms and not {"tpu", "axon"} & set(platforms.split(",")):
            return True
        _probe_cmd = [sys.executable, "-c",
                      "import jax; print(jax.devices()[0].platform)"]
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(_probe_cmd, capture_output=True,
                                  timeout=probe_timeout_s)
            if proc.returncode == 0:
                if attempt > 1:
                    print(f"# backend up after {attempt} probes", flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print("# backend never came up within "
                  f"{max_wait_s:.0f}s; proceeding anyway", flush=True)
            return False
        print(f"# backend unavailable (probe {attempt}); retrying "
              f"({remaining:.0f}s left)", flush=True)
        time.sleep(min(retry_sleep_s, max(0.05, remaining)))


def enable_compilation_cache(path: str = "/tmp/mri_tpu_jax_cache",
                             min_compile_secs: float = 1.0):
    """Persistent executable cache — remote TPU compiles on this platform
    cost minutes, cached reloads ~1s. Call before the first jit."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Sequence[int] | None = None,
    devices=None,
    multi_host: bool = False,
) -> Mesh:
    """Build a mesh over `devices` (default: all).

    If ``axis_sizes`` is None, all devices go to the first axis and the rest
    get size 1.  ``multi_host=True`` asserts a multi-process runtime
    (`initialize_distributed`) and keeps jax's host-major global device
    order, so the FIRST axis is the one sharded across hosts — put ``data``
    first and feed each host its `process_batch_bounds` slice
    (`host_local_batch`).
    """
    if multi_host and jax.process_count() == 1:
        raise RuntimeError(
            "create_mesh(multi_host=True) requires a multi-process runtime: "
            "call core.mesh.initialize_distributed(...) on every host first")
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if math.prod(axis_sizes) != n:
        raise ValueError(
            f"axis_sizes {tuple(axis_sizes)} do not multiply to #devices {n}"
        )
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: first array dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
