"""Continuous batched serving pipeline."""
import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.infer.serving import segment_volumes
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.ops import functional as _F
from mri_epilepsy_diagnosis_tpu.transforms import znormalization


def test_segment_volumes_stream(rng):
    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))

        vols = [rng.normal(size=(16, 16, 16)).astype(np.float32)
                for _ in range(5)]  # 5 volumes, batch 2 -> ragged final batch
        results = list(segment_volumes(
            lambda vv, b: model.apply(vv, b), v, vols, batch_size=2,
            dtype=jnp.float32, preprocess=lambda x: znormalization(x)))
        assert len(results) == 5
        for r in results:
            assert r["mask"].shape == (16, 16, 16)
            assert r["mask"].dtype == np.uint8

        # deterministic vs direct forward
        x = znormalization(jnp.asarray(vols[0]))[None, ..., None]
        direct = np.asarray(jnp.argmax(model.apply(v, x), -1))[0]
        np.testing.assert_array_equal(results[0]["mask"], direct)

        # repeated calls with the same fns reuse one compiled step
        from mri_epilepsy_diagnosis_tpu.infer import serving as S

        def apply2(vv, b):
            return model.apply(vv, b)

        n0 = len(S._STEP_CACHE)
        list(segment_volumes(apply2, v, vols[:2], batch_size=2,
                             dtype=jnp.float32))
        list(segment_volumes(apply2, v, vols[:2], batch_size=2,
                             dtype=jnp.float32))
        assert len(S._STEP_CACHE) == n0 + 1

        # producer errors must propagate, not truncate silently
        bad = [vols[0], np.zeros((9, 16, 16), np.float32)]
        try:
            list(segment_volumes(apply2, v, bad, batch_size=2,
                                 dtype=jnp.float32))
            raised = False
        except ValueError:
            raised = True
        assert raised
    finally:
        _F.set_precision_override(None)


def test_segment_volumes_mask_fn(rng):
    """Serving with the packed-space mask epilogue yields the same masks as
    the argmax-on-logits step."""
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2, packed_unet_mask_v2)

    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=8, num_encoding_blocks=3)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
        vols = [rng.normal(size=(16, 16, 16)).astype(np.float32)
                for _ in range(3)]
        via_argmax = list(segment_volumes(
            packed_unet_apply_v2, v, vols, batch_size=2, dtype=jnp.float32))
        via_mask = list(segment_volumes(
            packed_unet_apply_v2, v, vols, batch_size=2, dtype=jnp.float32,
            mask_fn=packed_unet_mask_v2))
        assert len(via_mask) == 3
        for a, b in zip(via_argmax, via_mask):
            np.testing.assert_array_equal(a["mask"], b["mask"])
            assert b["mask"].dtype == np.uint8
        # the recommended serving config: BN-folded variables + mask_fn
        # (docs/USAGE.md) — same masks again
        from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
            fold_bn_inference)
        via_folded = list(segment_volumes(
            packed_unet_apply_v2, fold_bn_inference(v), vols, batch_size=2,
            dtype=jnp.float32, mask_fn=packed_unet_mask_v2))
        for a, b in zip(via_argmax, via_folded):
            np.testing.assert_array_equal(a["mask"], b["mask"])
    finally:
        _F.set_precision_override(None)


def test_segment_volumes_data_parallel(rng):
    """Data-parallel serving over a 4-device mesh: the prefetch thread
    commits each batch to a data-axis sharding; masks must equal the
    unsharded stream's (same compiled semantics, GSPMD-partitioned)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mri_epilepsy_diagnosis_tpu.core.mesh import create_mesh

    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
        mesh = create_mesh(("data",), (4,), devices=jax.devices()[:4])
        shard = NamedSharding(mesh, P("data"))
        # 6 volumes at batch 4 -> one full + one padded ragged batch (the
        # pad keeps the batch divisible by the data axis)
        vols = [rng.normal(size=(16, 16, 16)).astype(np.float32)
                for _ in range(6)]
        sharded = list(segment_volumes(model.apply, v, vols, batch_size=4,
                                       dtype=jnp.float32, sharding=shard))
        plain = list(segment_volumes(model.apply, v, vols, batch_size=4,
                                     dtype=jnp.float32))
        assert len(sharded) == 6
        for a, b in zip(sharded, plain):
            np.testing.assert_array_equal(a["mask"], b["mask"])
    finally:
        _F.set_precision_override(None)


def test_segment_volumes_device_preprocess(rng):
    """Raw int16 volumes transfer and normalize on-device; masks must match
    the host-preprocess float path."""
    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
        raw = [(rng.normal(size=(16, 16, 16)) * 200 + 600).astype(np.int16)
               for _ in range(3)]

        def dev_pre(batch):  # (B, D, H, W, 1) raw ints -> znormed floats
            return jax.vmap(lambda vol: znormalization(
                vol[..., 0].astype(jnp.float32))[..., None])(batch)

        dev = list(segment_volumes(
            lambda vv, b: model.apply(vv, b), v, raw, batch_size=2,
            dtype=jnp.float32, transfer_dtype=np.int16,
            device_preprocess=dev_pre))
        host = list(segment_volumes(
            lambda vv, b: model.apply(vv, b), v,
            [r.astype(np.float32) for r in raw], batch_size=2,
            dtype=jnp.float32,
            preprocess=lambda x: znormalization(jnp.asarray(x))))
        assert len(dev) == 3
        for a, b in zip(dev, host):
            assert (a["mask"] == b["mask"]).mean() > 0.999
    finally:
        _F.set_precision_override(None)


def test_segment_volumes_yields_completed_before_producer_error(rng):
    """A producer-side failure in volume N must not discard the finished
    masks of the batch already computed and parked for readback overlap."""
    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
        vol = rng.normal(size=(16, 16, 16)).astype(np.float32)

        def volumes():
            yield vol
            yield vol  # completes batch 1 (batch_size=2)
            raise RuntimeError("stream died")

        results = segment_volumes(
            lambda vv, b: model.apply(vv, b), v, volumes(), batch_size=2,
            dtype=jnp.float32)
        got = []
        raised = False
        try:
            for r in results:
                got.append(r)
        except RuntimeError:
            raised = True
        assert raised
        assert len(got) == 2  # batch 1's masks were flushed, not discarded
        for r in got:
            assert r["mask"].shape == (16, 16, 16)
    finally:
        _F.set_precision_override(None)


def test_segment_volumes_flushes_on_stream_pause(rng):
    """A paused request stream must still receive completed masks: after
    batch i's step finishes, its results may not be withheld until batch
    i+1 arrives (liveness of the one-deep readback-overlap pipeline)."""
    import threading

    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
        vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
        got_first = threading.Event()

        def volumes():
            yield vol
            yield vol  # completes batch 1 (batch_size=2)
            # stall until the consumer has SEEN batch 1's masks — under a
            # strict dispatch-next-before-drain pipeline this deadlocks
            assert got_first.wait(timeout=60), \
                "batch 1 results withheld while the stream was paused"
            yield vol
            yield vol

        results = segment_volumes(
            lambda vv, b: model.apply(vv, b), v, volumes(), batch_size=2,
            dtype=jnp.float32)
        first = [next(results), next(results)]
        got_first.set()
        rest = list(results)
        assert len(first) == 2 and len(rest) == 2
        for r in first + rest:
            assert r["mask"].shape == (16, 16, 16)
    finally:
        _F.set_precision_override(None)


def test_step_cache_evicts_lru_not_fifo():
    """A hot step must survive cache-bound eviction (serving.py:30-37).

    Remote TPU recompiles cost minutes; if the bound cache evicted in FIFO
    order, a server cycling through >16 (apply_fn, dtype, ...) combos would
    repeatedly evict its hottest compiled step.  Pure-Python: _serving_step
    only builds the jitted closure, nothing compiles until it is called.
    """
    from mri_epilepsy_diagnosis_tpu.infer import serving as S

    saved = dict(S._STEP_CACHE)
    S._STEP_CACHE.clear()
    try:
        def make_apply(i):
            def apply_fn(vv, b, _i=i):
                return b
            return apply_fn

        fns = [make_apply(i) for i in range(17)]
        for f in fns[:16]:
            S._serving_step(f, None, jnp.float32)
        assert len(S._STEP_CACHE) == 16

        hot = S._serving_step(fns[0], None, jnp.float32)  # touch the oldest
        S._serving_step(fns[16], None, jnp.float32)       # force an eviction

        assert len(S._STEP_CACHE) == 16
        # LRU: the re-touched fns[0] step survives; FIFO would have evicted it
        assert S._serving_step(fns[0], None, jnp.float32) is hot
        # and the actual victim was the least-recently-used entry, fns[1]
        keys = {k[0] for k in S._STEP_CACHE}
        assert fns[1] not in keys and fns[16] in keys
    finally:
        S._STEP_CACHE.clear()
        S._STEP_CACHE.update(saved)


def test_segment_volumes_pack_masks(rng):
    """pack_masks=True (8 voxels/byte on device, np.unpackbits on host)
    must yield masks identical to the plain path, including a padded
    final batch."""
    _F.set_precision_override("fast")
    try:
        model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
        v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
        vols = [rng.normal(size=(16, 16, 16)).astype(np.float32)
                for _ in range(3)]
        plain = list(segment_volumes(model.apply, v, vols, batch_size=2,
                                     dtype=jnp.float32))
        packed = list(segment_volumes(model.apply, v, vols, batch_size=2,
                                      dtype=jnp.float32, pack_masks=True))
        assert len(packed) == 3
        for a, b in zip(packed, plain):
            assert a["mask"].shape == (16, 16, 16)
            np.testing.assert_array_equal(a["mask"], b["mask"])

        with pytest.raises(ValueError, match="divisible by 8"):
            list(segment_volumes(
                model.apply, v,
                [rng.normal(size=(12, 12, 12)).astype(np.float32)],
                batch_size=1, dtype=jnp.float32, pack_masks=True))
    finally:
        _F.set_precision_override(None)
