"""Pallas kernels — correctness in interpreter mode (CPU suite).

The compiled path is exercised on real TPU via bench/tuning scripts; this
toolchain's Mosaic currently crashes on minor-dim concats with thin channels
(tracked for the next optimization round), so the kernel is opt-in.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.ops import functional as F
from mri_epilepsy_diagnosis_tpu.ops.pallas_kernels import (conv_one_axis,
                                                           separable_conv3d)


@pytest.mark.parametrize("axis,stride,pad,k", [
    (3, 1, 1, 3), (1, 2, 2, 6), (2, 1, 0, 3), (3, 3, 1, 3),
])
def test_conv_one_axis_matches_xla(rng, axis, stride, pad, k):
    x = jnp.asarray(rng.normal(size=(2, 12, 10, 14, 4)).astype(np.float32))
    w = rng.normal(size=(k, 4, 6)).astype(np.float32)
    shape5 = [1, 1, 1]
    shape5[axis - 1] = k
    w5 = w.reshape(*shape5, 4, 6)
    s3, p3 = [1, 1, 1], [0, 0, 0]
    s3[axis - 1], p3[axis - 1] = stride, pad
    ref = F.conv3d(x, jnp.asarray(w5), stride=tuple(s3), padding=tuple(p3))
    got = conv_one_axis(x, jnp.asarray(w), axis, stride=stride, pad=pad,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_separable_stack_matches_xla(rng):
    wx = rng.normal(size=(6, 1, 8)).astype(np.float32)
    wy = rng.normal(size=(6, 8, 8)).astype(np.float32)
    wz = rng.normal(size=(6, 8, 8)).astype(np.float32)
    bx = rng.normal(size=(8,)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    ref = F.conv3d(x, jnp.asarray(wx[:, None, None]), jnp.asarray(bx),
                   stride=(2, 1, 1), padding=(2, 0, 0))
    ref = F.conv3d(ref, jnp.asarray(wy[None, :, None]), stride=(1, 2, 1),
                   padding=(0, 2, 0))
    ref = F.conv3d(ref, jnp.asarray(wz[None, None, :]), stride=(1, 1, 2),
                   padding=(0, 0, 2))
    got = separable_conv3d(x, jnp.asarray(wx), jnp.asarray(wy),
                           jnp.asarray(wz), stride=(2, 2, 2), pad=(2, 2, 2),
                           biases=(jnp.asarray(bx), None, None),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
