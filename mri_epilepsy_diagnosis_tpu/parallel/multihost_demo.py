"""Real multi-process (multi-host) execution of the training step.

The reference has no distributed runtime at all (SURVEY.md §2.3); the
TPU-native design's DCN path (`core/mesh.py`: `initialize_distributed`,
`create_mesh(multi_host=True)`, `process_batch_bounds`, `host_local_batch`)
was — until round 4 — only ever exercised with `jax.process_count() == 1`.
This module is the worker a REAL 2-process run executes: each process owns
`--local-devices` virtual CPU devices, joins a localhost coordinator, lays
the global ('data', 'spatial') mesh out host-major, feeds only its
`process_batch_bounds` slice of a deterministic global batch through
`host_local_batch`, runs ONE `seg_train_step` SPMD across both processes
(gradient psum rides the inter-process channel), and writes its loss +
parameter checksum for the parent to compare against the single-process
value.

Spawned by `tests/test_multihost.py` and `__graft_entry__.dryrun_multichip`
sub-check (e):

    python -m mri_epilepsy_diagnosis_tpu.parallel.multihost_demo \
        --coordinator 127.0.0.1:<port> --num-processes 2 --process-id <i> \
        --out /tmp/host<i>.json
"""
from __future__ import annotations

import argparse
import json
import os


# The deterministic toy problem both the workers and the single-process
# reference solve (fixed sizes so every run computes the identical program;
# 2 processes x 4 local devices -> a (data=4, spatial=2) global mesh).
GLOBAL_BATCH = 4
SIZE = 16


def _make_data():
    import numpy as np

    r = np.random.default_rng(0)
    x = r.normal(size=(GLOBAL_BATCH, SIZE, SIZE, SIZE, 1)).astype(np.float32)
    y = (r.random((GLOBAL_BATCH, SIZE, SIZE, SIZE, 1)) > 0.7).astype(
        np.float32)
    return x, y


def _make_state():
    import jax.numpy as jnp

    from ..models import UNet3D
    from ..train.optim import torch_adamw
    from ..train.state import create_train_state

    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=2,
                   out_channels_first_layer=4)
    return create_train_state(model, torch_adamw(1e-3),
                              jnp.zeros((1, SIZE, SIZE, SIZE, 1)))


def _param_checksum(params):
    import jax
    import numpy as np

    return float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                     for l in jax.tree.leaves(params)))


def reference_loss():
    """Single-process, unsharded value of the same step (the oracle)."""
    from ..ops import functional as F
    from ..train.seg import seg_train_step

    F.set_precision_override("fast")
    try:
        x, y = _make_data()
        state = _make_state()
        state, loss = seg_train_step(state, x, y)
        return float(loss), _param_checksum(state.params)
    finally:
        F.set_precision_override(None)


def run_worker(coordinator: str, num_processes: int, process_id: int,
               local_devices: int = 4) -> dict:
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.mesh import (create_mesh, host_local_batch,
                             initialize_distributed, process_batch_bounds)
    from ..ops import functional as F
    from ..train.seg import seg_train_step

    assert initialize_distributed(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes
    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    # host-major mesh: the data axis (outermost) spans processes, the
    # spatial axis stays inside each process (halo exchange on the fast
    # intra-host channel, gradient all-reduce between hosts — the
    # DCN-outermost layout of SURVEY.md §2.3)
    mesh = create_mesh(("data", "spatial"),
                       (n_global // 2, 2), multi_host=True)

    F.set_precision_override("fast")
    x, y = _make_data()
    lo, hi = process_batch_bounds(GLOBAL_BATCH)
    vol_shard = NamedSharding(mesh, P("data", "spatial"))
    xg = host_local_batch(x[lo:hi], mesh, vol_shard)
    yg = host_local_batch(y[lo:hi], mesh, vol_shard)

    # identical init on every process (seeded) -> replicate as global arrays
    state = _make_state()
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
        state)

    state, loss = seg_train_step(state, xg, yg)
    return {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh": dict(mesh.shape),
        "batch_bounds": [lo, hi],
        "loss": float(loss),
        "param_checksum": _param_checksum(state.params),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    # must precede any backend touch; the image's sitecustomize imports jax
    # at interpreter start with JAX_PLATFORMS=axon pinned, so override via
    # jax.config (the env alone is already frozen)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.local_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    result = run_worker(args.coordinator, args.num_processes,
                        args.process_id, args.local_devices)
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"multihost worker {args.process_id} ok: {result}", flush=True)


if __name__ == "__main__":
    main()
