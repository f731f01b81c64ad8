"""Dice/IoU and surface-distance metrics; parity vs the reference's vendored
surface-distance library where the checkout is available."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import requires_reference

from mri_epilepsy_diagnosis_tpu import metrics as M


def test_soft_dice_matches_reference_semantics(rng):
    out = jnp.asarray(rng.random((2, 2, 8, 8, 8)).astype(np.float32))
    tgt = jnp.asarray((rng.random((2, 2, 8, 8, 8)) > 0.5).astype(np.float32))
    score = np.asarray(M.get_dice_score(out, tgt))
    assert score.shape == (2, 2)
    # manual check of the tp/fp/fn formula on one (batch, channel)
    p0 = np.asarray(out)[0, 0]
    g0 = np.asarray(tgt)[0, 0]
    tp, fp = (p0 * g0).sum(), (p0 * (1 - g0)).sum()
    fn = ((1 - p0) * g0).sum()
    np.testing.assert_allclose(score[0, 0], 2 * tp / (2 * tp + fp + fn + 1e-9),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(M.get_dice_loss(out, tgt)),
                               1 - score, rtol=1e-6)


def test_iou_and_volumetric_dice():
    a = np.zeros((8, 8, 8), bool)
    b = np.zeros((8, 8, 8), bool)
    a[:4], b[2:6] = True, True
    assert M.get_iou_score(a, b) == pytest.approx(2 / 6)
    assert M.compute_dice_coefficient(a, b) == pytest.approx(0.5)
    assert np.isnan(M.compute_dice_coefficient(np.zeros((4, 4, 4)),
                                               np.zeros((4, 4, 4))))


def test_surface_distances_basic():
    m = np.zeros((20, 20, 20), bool)
    m[5:15] = True
    m2 = np.roll(m, 1, axis=0)
    sd = M.compute_surface_distances(m, m2, (1, 1, 1))
    asd = M.compute_average_surface_distance(sd)
    assert asd[0] == pytest.approx(1.0, abs=0.05)
    assert M.compute_robust_hausdorff(sd, 95) == pytest.approx(1.0, abs=0.01)
    assert M.compute_surface_dice_at_tolerance(sd, 1.0) == pytest.approx(1.0)
    lo, hi = M.compute_surface_overlap_at_tolerance(sd, 0.5)
    assert lo < 1.0

    # identical masks -> zero distances
    sd0 = M.compute_surface_distances(m, m, (1, 1, 1))
    assert M.compute_average_surface_distance(sd0) == (0.0, 0.0)


@requires_reference
def test_surface_metrics_parity_with_reference_library():
    sys.path.insert(0, "/root/reference/segmentation")
    import metrics as ref

    g = np.mgrid[0:40, 0:40, 0:40]
    sphere = ((g[0] - 20) ** 2 + (g[1] - 20) ** 2 + (g[2] - 20) ** 2) < 12 ** 2
    blob = ((g[0] - 21) ** 2 + (g[1] - 19.5) ** 2 + (g[2] - 20) ** 2) < 11.5 ** 2

    mine = M.compute_surface_distances(sphere, blob, (1, 1, 1))
    theirs = ref.compute_surface_distances(sphere, blob, (1, 1, 1))

    asd_m = M.compute_average_surface_distance(mine)
    asd_t = ref.compute_average_surface_distance(theirs)
    assert asd_m[0] == pytest.approx(asd_t[0], rel=1e-3)
    assert asd_m[1] == pytest.approx(asd_t[1], rel=1e-3)
    assert (M.compute_robust_hausdorff(mine, 95)
            == pytest.approx(ref.compute_robust_hausdorff(theirs, 95),
                             rel=1e-3))
    assert (M.compute_surface_dice_at_tolerance(mine, 1.0)
            == pytest.approx(ref.compute_surface_dice_at_tolerance(theirs, 1.0),
                             rel=1e-3))
    assert (M.compute_dice_coefficient(sphere, blob)
            == pytest.approx(ref.compute_dice_coefficient(sphere, blob),
                             rel=1e-9))


@requires_reference
@pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (0.7, 1.3, 2.1),
                                     (2.0, 0.5, 0.9)])
def test_area_table_parity_all_256_codes(spacing):
    """The generated area table must reproduce the reference's hand-written
    256-entry marching-cubes normals table bit-for-bit (up to f64 rounding),
    isotropic and anisotropic."""
    sys.path.insert(0, "/root/reference/segmentation")
    import metrics as ref

    theirs = np.zeros(256)
    for code in range(256):
        normals = np.asarray(ref.neighbour_code_to_normals[code], np.float64)
        if normals.size:
            n = normals.reshape(-1, 3).copy()
            n[:, 0] *= spacing[1] * spacing[2]
            n[:, 1] *= spacing[0] * spacing[2]
            n[:, 2] *= spacing[0] * spacing[1]
            theirs[code] = np.linalg.norm(n, axis=1).sum()

    mine = M.neighbour_code_to_surface_area(spacing)
    np.testing.assert_allclose(mine, theirs, rtol=1e-12, atol=1e-12)
