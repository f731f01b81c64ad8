"""Host input pipeline: threaded PatchQueue, streaming batcher, prefetch."""
import numpy as np
import pytest

from mri_epilepsy_diagnosis_tpu.data import (PatchQueue, batched,
                                             prefetch_to_device)


class _Volumes:
    """Tiny synthetic (img, seg) dataset in the reference's (C,D,H,W)."""

    def __init__(self, n=4, size=12, fail_at=None):
        self.n = n
        self.size = size
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError("decode failed")
        rng = np.random.default_rng(i)
        img = rng.normal(size=(1, self.size, self.size, self.size)).astype(
            np.float32)
        seg = (img > 0).astype(np.float32)
        return img, seg


def _collect(queue):
    return [(i.copy(), s.copy()) for i, s in queue]


@pytest.mark.parametrize("workers", [1, 4])
def test_patch_queue_threaded_matches_synchronous(workers):
    """The producer thread (and bounded load pool) must preserve the exact
    synchronous patch stream: one RNG, one consumption order."""
    kw = dict(max_length=10, samples_per_volume=3, patch_size=6, seed=7)
    sync = _collect(PatchQueue(_Volumes(), num_workers=0, **kw))
    thr = _collect(PatchQueue(_Volumes(), num_workers=workers, **kw))
    assert len(sync) == len(thr) == 4 * 3
    for (a, b), (c, d) in zip(sync, thr):
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)


def test_patch_queue_propagates_load_errors():
    q = PatchQueue(_Volumes(fail_at=2), shuffle_subjects=False,
                   samples_per_volume=2, patch_size=6, num_workers=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        _collect(q)


def test_patch_queue_reiterable():
    q = PatchQueue(_Volumes(), samples_per_volume=2, patch_size=6, seed=3)
    first, second = _collect(q), _collect(q)
    assert len(first) == len(second) == 8
    # a fresh pass reshuffles (continuing RNG state), but shapes hold
    assert all(i.shape == (1, 6, 6, 6) for i, _ in second)


def test_batched_streaming_and_reiterable():
    q = PatchQueue(_Volumes(), samples_per_volume=3, patch_size=6,
                   num_workers=1)
    loader = batched(q, batch_size=5)
    shapes1 = [b[0].shape for b in loader]
    shapes2 = [b[0].shape for b in loader]  # re-iterates the queue
    assert shapes1 == [(5, 6, 6, 6, 1), (5, 6, 6, 6, 1), (2, 6, 6, 6, 1)]
    assert shapes2 == shapes1
    assert [b[0].shape for b in batched(q, 5, drop_last=True)] == shapes1[:2]


def test_prefetch_to_device_preserves_batches():
    batches = [(np.full((2, 3), i, np.float32), np.array([i, i]))
               for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(x), batches[i][0])
        np.testing.assert_array_equal(np.asarray(y), batches[i][1])


def test_prefetch_to_device_propagates_errors():
    def gen():
        yield (np.zeros((1,)),)
        raise ValueError("host decode exploded")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(ValueError, match="host decode exploded"):
        next(it)
