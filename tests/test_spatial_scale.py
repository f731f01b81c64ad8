"""Spatial sharding at production shape — VERDICT r3 ask #3.

Everything multi-device before round 4 ran 16^3-64^3 toys; GSPMD halo
insertion on the packed shifted-conv chains is exactly the kind of thing
that works at 32^3 and mis-partitions at scale.  These gates run the
REAL packed 192^3-training-layout step and the sliding-window serving
path at 96^3 on the 8-virtual-device mesh, check parity against the
single-device result, and assert — from the optimized (post-GSPMD) HLO —
that no all-gather of the full volume sneaks in (halos must move as
collective-permutes / sub-volume slices, grad reductions as all-reduce).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mri_epilepsy_diagnosis_tpu.core.mesh import create_mesh
from mri_epilepsy_diagnosis_tpu.obs.trace_summary import hlo_collective_rows
from mri_epilepsy_diagnosis_tpu.ops import functional as _F


@pytest.fixture(autouse=True, scope="module")
def _fast_precision():
    _F.set_precision_override("fast")
    yield
    _F.set_precision_override(None)


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


@pytest.mark.slow
@pytest.mark.isolated
def test_packed_train_step_spatially_sharded_96(rng):
    """Packed train step at 96^3, volume D-axis sharded over ALL 8 devices
    (the hardest partitioning: every conv chain crosses 7 shard
    boundaries).  Loss and updated params must match the single-device
    step; the partitioned HLO must not contain a volume-scale all-gather.
    """
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.seg import (_packed_seg_train_step,
                                                      packed_seg_train_step)
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    size = 96
    mesh = create_mesh(("data", "spatial"), (1, 8))
    # ocfl=4: the GSPMD partitioning pattern (halo insertion on the
    # shifted-conv chains) depends on the graph STRUCTURE and the 96^3
    # spatial extent, not channel width — half-width keeps this gate's
    # two 96^3 CPU compiles inside the suite budget
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=4)

    def fresh_state():
        return create_train_state(model, torch_adamw(1e-3),
                                  jnp.zeros((1, 16, 16, 16, 1)))

    x = rng.normal(size=(1, size, size, size, 1)).astype(np.float32)
    y = (rng.random((1, size, size, size, 1)) > 0.6).astype(np.float32)

    # single-device reference
    st_ref, loss_ref = packed_seg_train_step(fresh_state(), jnp.asarray(x),
                                             jnp.asarray(y))
    loss_ref = float(loss_ref)

    vol = NamedSharding(mesh, P("data", "spatial"))
    rep = NamedSharding(mesh, P())
    xs = jax.device_put(jnp.asarray(x), vol)
    ys = jax.device_put(jnp.asarray(y), vol)
    st_sh = jax.device_put(fresh_state(), rep)

    # the collective audit must see the exact executable the parity run
    # uses: lower with the sharded arguments, audit, then execute the SAME
    # compiled object (one 96^3 compile, not two)
    compiled = _packed_seg_train_step.lower(st_sh, xs, ys, False,
                                            "explicit").compile()
    hlo = compiled.as_text()
    rows = hlo_collective_rows(hlo)
    assert rows, "expected GSPMD collectives in the sharded train step"
    vol_bytes = x.nbytes  # one full fine volume (96^3 f32 = 3.5 MB)
    gathers = [r for r in rows if r[1] == "all-gather"]
    too_big = [r for r in gathers if r[0] >= vol_bytes]
    assert not too_big, (
        "full-volume all-gather leaked into the spatially-sharded step: "
        + "; ".join(f"{b / 1e6:.1f} MB {k} {n} {s}" for b, k, n, s in too_big[:5]))

    st_sh, loss_sh = compiled(st_sh, xs, ys)
    np.testing.assert_allclose(float(loss_sh), loss_ref, rtol=2e-3, atol=2e-3)
    for a, b in zip(jax.tree.leaves(st_sh.params),
                    jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=5e-3)


@pytest.mark.slow
@pytest.mark.isolated
def test_sliding_window_spatially_sharded_96(rng):
    """Sliding-window (GridSampler-parity) serving at 96^3 with the patch
    batches sharded batch-over-data / D-over-spatial: equals the
    unsharded prediction."""
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.infer.sliding_window import (
        make_sharded_apply, sliding_window_predict)
    from mri_epilepsy_diagnosis_tpu.models import UNet3D

    mesh = create_mesh(("data", "spatial"), (2, 4))
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=4)
    v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    vol = jnp.asarray(rng.normal(size=(96, 96, 96, 1)).astype(np.float32))

    kw = dict(patch_size=32, overlap=4, batch_size=8, num_classes=2)
    ref = sliding_window_predict(
        lambda vv, p: model.apply(vv, p), v, vol, **kw)
    sharded = sliding_window_predict(
        make_sharded_apply(model.apply, mesh),
        jax.device_put(v, NamedSharding(mesh, P())), vol, **kw)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
