"""Native C++ components: exact EDT vs scipy golden."""
import numpy as np
from scipy import ndimage

from mri_epilepsy_diagnosis_tpu.native import edt3d, native_available


def test_native_builds():
    assert native_available()


def test_edt3d_matches_scipy(rng):
    for shape, spacing in [((24, 24, 24), (1, 1, 1)),
                           ((30, 20, 10), (1.0, 0.7, 2.5)),
                           ((8, 8, 8), (2.0, 2.0, 2.0))]:
        m = rng.random(shape) > 0.98
        m.flat[0] = True
        got = edt3d(m, spacing)
        ref = ndimage.distance_transform_edt(~m, sampling=spacing)
        np.testing.assert_allclose(got, ref, atol=1e-9)


def test_edt3d_edge_cases():
    assert np.isinf(edt3d(np.zeros((4, 4, 4), bool))).all()
    full = edt3d(np.ones((4, 4, 4), bool))
    np.testing.assert_array_equal(full, 0.0)
    single = np.zeros((5, 5, 5), bool)
    single[2, 2, 2] = True
    d = edt3d(single)
    assert d[2, 2, 2] == 0.0
    np.testing.assert_allclose(d[0, 2, 2], 2.0)
    np.testing.assert_allclose(d[0, 0, 0], np.sqrt(12.0))
