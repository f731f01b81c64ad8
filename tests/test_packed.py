"""Packed (space-to-depth) execution layout — exactness vs the fine path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.ops import packed as P


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16, 5)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(P.unpack2(P.pack2(x))),
                                  np.asarray(x))


def test_conv3_packed_matches_fine(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    ref = F.conv3d(x, w, b, padding=1)
    out = P.unpack2(P.conv3_packed(P.pack2_shifted(x), P.pack_weights2(w), b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_repack_shifted_matches_pack2_shifted(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 4)), jnp.float32)
    direct = P.pack2_shifted(x)
    via_aligned = P.repack_shifted(P.pack2(x))
    np.testing.assert_array_equal(np.asarray(via_aligned), np.asarray(direct))


def test_chained_convs_packed(rng):
    """conv -> conv without leaving packed layout (repack_shifted path)."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 3)) * 0.2, jnp.float32)
    ref = F.conv3d(F.conv3d(x, w1, padding=1), w2, padding=1)

    y = P.conv3_packed(P.pack2_shifted(x), P.pack_weights2(w1))
    y = P.conv3_packed(P.repack_shifted(y), P.pack_weights2(w2))
    np.testing.assert_allclose(np.asarray(P.unpack2(y)), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_maxpool2_packed_matches_fine(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)), jnp.float32)
    ref = P.pack2(F.maxpool3d(x, 2))
    out = P.maxpool2_packed(P.pack2(x))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_upsample2_packed_matches_fine(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)), jnp.float32)
    ref = P.pack2(F.resize_linear(x, (16, 16, 16), align_corners=False))
    out = P.upsample2_packed(P.pack2(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv1_packed_and_concat(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 6)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)), jnp.float32)
    cat_ref = P.pack2(jnp.concatenate([x, y], axis=-1))
    cat = P.concat_channels_packed(P.pack2(x), P.pack2(y))
    np.testing.assert_array_equal(np.asarray(cat), np.asarray(cat_ref))

    w = jnp.asarray(rng.normal(size=(1, 1, 1, 6, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2,)), jnp.float32)
    ref = F.conv3d(x, w, b)
    out = P.unpack2(P.conv1_packed(P.pack2(x), w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_mask_v2_matches_argmax(rng):
    """The packed-space class compare (serving mask path) equals argmax of
    the fine logits, including argmax's keep-class-0 tie-breaking."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2, packed_unet_mask_v2)
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
    ref = jnp.argmax(packed_unet_apply_v2(v, x), -1)
    np.testing.assert_array_equal(np.asarray(packed_unet_mask_v2(v, x)),
                                  np.asarray(ref))
    model3 = UNet3D(in_channels=1, out_classes=3, num_encoding_blocks=3,
                    out_channels_first_layer=8)
    v3 = model3.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    with pytest.raises(ValueError, match="out_classes == 2"):
        packed_unet_mask_v2(v3, x)


def test_fold_bn_inference_matches_live_bn(rng):
    """Folding eval-mode BN into conv weights/biases (fold_bn_inference)
    reproduces the live-BN packed forward, including through the decoder's
    w1 input-channel split (scale rides both w_s and the bias-less upconv
    w_u; the folded bias lands on y_s once)."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        fold_bn_inference, packed_unet_apply_v2, packed_unet_mask_v2)
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))

    def randomize(tree, path=()):
        if isinstance(tree, dict):
            return {k: randomize(val, path + (k,)) for k, val in tree.items()}
        if path[-1:] == ("running_mean",):
            return jnp.asarray(rng.normal(0, 0.3, tree.shape), tree.dtype)
        if path[-1:] == ("running_var",):
            return jnp.asarray(rng.uniform(0.5, 2.0, tree.shape), tree.dtype)
        if path[-2:-1] == ("norm_layer",):
            return jnp.asarray(rng.normal(1.0, 0.2, tree.shape), tree.dtype)
        return tree

    v = {"params": randomize(v["params"]),
         "batch_stats": randomize(v["batch_stats"])}
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
    ref = packed_unet_apply_v2(v, x)
    folded = fold_bn_inference(v)
    assert "batch_stats" not in folded
    assert not any(
        "norm_layer" in jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(folded["params"]))
    out = packed_unet_apply_v2(folded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(packed_unet_mask_v2(folded, x)),
                                  np.asarray(packed_unet_mask_v2(v, x)))


def test_pack2_conv_matches_pack2(rng):
    """The identity-conv space-to-depth (used to pack training targets —
    see packed_dice_loss) is bit-equal to the transpose pack2."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(P.pack2_conv(x)),
                                  np.asarray(P.pack2(x)))


def test_maxpool_cascade_and_head_blockdiag_variants(rng, monkeypatch):
    """The env-pinned alternates (cascade maxpool, blockdiag head) are
    bit-equal to the reshape formulations, standalone and through the full
    v2 apply (they exist to dodge XLA relayout copies on TPU — see
    experiments/infer_variants_ab.py)."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 16)), jnp.float32)
    xp = P.pack2(x)
    np.testing.assert_array_equal(np.asarray(P.maxpool2_packed(xp)),
                                  np.asarray(P.maxpool2_packed_cascade(xp)))
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(P.conv1_packed(xp, w, b)),
        np.asarray(P.conv1_packed_blockdiag(xp, w, b)), rtol=1e-6, atol=1e-6)

    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2)
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=8)
    v = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1)))
    xin = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    base = packed_unet_apply_v2(v, xin)
    monkeypatch.setenv("MRI_TPU_MAXPOOL", "cascade")
    monkeypatch.setenv("MRI_TPU_HEAD", "blockdiag")
    alt = packed_unet_apply_v2(v, xin)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_conv3_packed_as_matches_fine(rng):
    """aligned -> shifted conv: unshifting via pack2_shifted comparison."""
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 10, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    ref_fine = F.conv3d(x, w, b, padding=1)
    ref_shifted = P.pack2_shifted(ref_fine)
    out = P.conv3_packed_as(P.pack2(x), P.pack_weights2_as(w), b)
    # pad voxels differ (conv extrapolation vs zero) — compare after zeroing
    out = P.zero_shifted_pads(out)
    # the bias also lands on ref's pad voxels: zero them there too
    ref_shifted = P.zero_shifted_pads(ref_shifted)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_shifted),
                               rtol=1e-4, atol=1e-4)


def test_alternating_convs_no_repack(rng):
    """conv1 (a->s) then conv2 (s->a) == two fine convs, zero repacks."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 2)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 4)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 3)) * 0.2, jnp.float32)
    ref = F.conv3d(F.conv3d(x, w1, padding=1), w2, padding=1)

    y = P.conv3_packed_as(P.pack2(x), P.pack_weights2_as(w1))
    y = P.zero_shifted_pads(y)
    y = P.conv3_packed(y, P.pack_weights2(w2))
    np.testing.assert_allclose(np.asarray(P.unpack2(y)), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_shifted_pads_only_touches_pads(rng):
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 2)), jnp.float32)
    xs = P.pack2_shifted(x)          # true pads are already zero
    out = P.zero_shifted_pads(xs + 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(xs))
    # and a fully-ones tensor keeps exactly the non-pad voxels
    ones = jnp.ones_like(xs)
    kept = P.zero_shifted_pads(ones)
    fine = np.asarray(kept)
    assert fine.sum() == np.prod(x.shape)  # one surviving slot per fine voxel


def test_upconv_packed_matches_fine(rng):
    """Composed upsample+conv (with face fixes) == resize_linear + conv3d."""
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)) * 0.2, jnp.float32)
    up = F.resize_linear(x, (24, 24, 24), align_corners=False)
    ref = P.pack2_shifted(F.conv3d(up, w, padding=1))

    xp = P.pack2(x)
    out = P.upconv_packed(xp, P.pack_upconv_weights(w))
    out = P.upconv_fix_faces(out, xp, w)
    out = P.zero_shifted_pads(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ocfl,nb,size", [(4, 2, 8), (8, 3, 16),
                                          (16, 3, 16)])
def test_packed_unet_v2_matches_unet3d(rng, ocfl, nb, size):
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_apply_v2)

    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=nb,
                   out_channels_first_layer=ocfl)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    x0 = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)
    _, new_vars = model.apply(v, x0, train=True, mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": new_vars["batch_stats"]}

    x = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)
    ref = np.asarray(model.apply(v, x))
    out = np.asarray(packed_unet_apply_v2(v, x, num_encoding_blocks=nb))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ocfl,nb,size", [(4, 2, 8), (8, 3, 16)])
def test_packed_unet_matches_unet3d(rng, ocfl, nb, size):
    """The packed forward must reproduce UNet3D.apply exactly (same
    variables, eval mode) — the flagship parity guarantee."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import packed_unet_apply

    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=nb,
                   out_channels_first_layer=ocfl)
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    # make BN stats nontrivial (one train-mode pass)
    x0 = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)
    _, new_vars = model.apply(v, x0, train=True, mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": new_vars["batch_stats"]}

    x = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)
    ref = np.asarray(model.apply(v, x))
    out = np.asarray(packed_unet_apply(v, x, num_encoding_blocks=nb))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# packed training
# ---------------------------------------------------------------------------


def _trained_variables(model, rng, size):
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    x0 = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)
    _, new_vars = model.apply(v, x0, train=True, mutable=["batch_stats"])
    return {"params": v["params"], "batch_stats": new_vars["batch_stats"]}


def test_packed_train_apply_matches_unet3d(rng):
    """Train-mode packed forward: logits AND updated BatchNorm running
    statistics must match the fine `mutable=["batch_stats"]` apply."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_train_apply)

    size = 16
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=4)
    v = _trained_variables(model, rng, size)
    x = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)

    ref, new_vars = model.apply(v, x, train=True, mutable=["batch_stats"])
    logits_p, bs = packed_unet_train_apply(v, x)
    out = np.asarray(P.unpack2(logits_p))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)

    ref_bs = new_vars["batch_stats"]
    assert (jax.tree_util.tree_structure(bs)
            == jax.tree_util.tree_structure(ref_bs))
    for a, b in zip(jax.tree_util.tree_leaves(bs),
                    jax.tree_util.tree_leaves(ref_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_packed_train_dec_up_modes_match(rng):
    """The decoder's two up-branch formulations ("explicit" upsample+conv
    vs the "composed" 5^3 transposed conv + face fixes) are the same
    function: logits and batch stats must agree to contraction noise."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.models.unet_packed import (
        packed_unet_train_apply)

    size = 16
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                   out_channels_first_layer=4)
    v = _trained_variables(model, rng, size)
    x = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)

    le, bse = packed_unet_train_apply(v, x, dec_up="explicit")
    lc, bsc = packed_unet_train_apply(v, x, dec_up="composed")
    np.testing.assert_allclose(np.asarray(le), np.asarray(lc),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bse),
                    jax.tree_util.tree_leaves(bsc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_packed_train_hybrid_vjp_matches_composed(rng):
    """dec_up="hybrid" (custom qgroup-dw VJP for the composed upconv) is the
    same forward as "composed" and its hand-rolled gradients must track
    XLA's to contraction noise through one optimizer step."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    F.set_precision_override("fast")
    try:
        model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                       out_channels_first_layer=4)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
        y = jnp.asarray(rng.random((2, 16, 16, 16, 1)) > 0.6, jnp.float32)
        s1 = create_train_state(model, torch_adamw(1e-3),
                                jnp.zeros((1, 8, 8, 8, 1)))
        s2 = jax.tree_util.tree_map(jnp.copy, s1)
        s1, l1 = packed_seg_train_step(s1, x, y, dec_up="composed")
        s2, l2 = packed_seg_train_step(s2, x, y, dec_up="hybrid")
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5, atol=1e-6)
        # Adam amplifies bf16-level (DEFAULT precision) rounding on
        # near-zero grad elements — same tolerance story as test_accum
        for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)
    finally:
        F.set_precision_override(None)


def test_packed_train_step_matches_fine(rng):
    """One full optimizer step (loss, grads through packed convs/BN/dice)
    must track the fine `seg_train_step`."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.seg import (packed_seg_train_step,
                                                      seg_train_step)
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    F.set_precision_override("fast")  # CPU HIGHEST conv grads compile ~25x slower
    try:
        size = 16
        model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                       out_channels_first_layer=4)
        tx = torch_adamw(1e-3)
        x = jnp.asarray(rng.normal(size=(2, size, size, size, 1)), jnp.float32)
        y = jnp.asarray(rng.random((2, size, size, size, 1)) > 0.6, jnp.float32)

        s_fine = create_train_state(model, tx, jnp.zeros((1, 8, 8, 8, 1)))
        # real copies: both steps donate their state's buffers
        s_pack = jax.tree_util.tree_map(jnp.copy, s_fine)
        s_fine, loss_f = seg_train_step(s_fine, x, y)
        s_pack, loss_p = packed_seg_train_step(s_pack, x, y)
        np.testing.assert_allclose(float(loss_p), float(loss_f),
                                   rtol=5e-4, atol=5e-4)
        # post-Adam parameters stay close (grads match to contraction noise)
        for a, b in zip(jax.tree_util.tree_leaves(s_pack.params),
                        jax.tree_util.tree_leaves(s_fine.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=2e-3)
        # a second packed step keeps training stable
        s_pack, loss_p2 = packed_seg_train_step(s_pack, x, y)
        assert np.isfinite(float(loss_p2))
    finally:
        F.set_precision_override(None)


def test_packed_train_remat_matches_nonremat(rng):
    """jax.checkpoint per block must not change the step's numerics."""
    from mri_epilepsy_diagnosis_tpu.models import UNet3D
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adamw
    from mri_epilepsy_diagnosis_tpu.train.seg import packed_seg_train_step
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state

    F.set_precision_override("fast")
    try:
        model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=3,
                       out_channels_first_layer=4)
        tx = torch_adamw(1e-3)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
        y = jnp.asarray(rng.random((2, 16, 16, 16, 1)) > 0.6, jnp.float32)
        s1 = create_train_state(model, tx, jnp.zeros((1, 8, 8, 8, 1)))
        s2 = jax.tree_util.tree_map(jnp.copy, s1)
        s1, l1 = packed_seg_train_step(s1, x, y, remat=False)
        s2, l2 = packed_seg_train_step(s2, x, y, remat=True)
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)
    finally:
        F.set_precision_override(None)
