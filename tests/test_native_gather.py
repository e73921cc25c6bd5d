"""Native C++ window-gather vs the numpy fallback, and the prefetch pipe."""

import numpy as np
import pytest

from neurosync_trainer_lite_tpu.data.native import load_library, NativeGather
from neurosync_trainer_lite_tpu.data.windowing import WindowedDataset, prefetch


def _clips(rng, n=3, tmin=140, tmax=300):
    out = []
    for i in range(n):
        T = int(rng.integers(tmin, tmax))
        out.append((rng.standard_normal((T, 16)).astype(np.float32),
                    rng.standard_normal((T, 5)).astype(np.float32)))
    return out


def test_library_builds():
    assert load_library() is not None, "g++ build of window_gather failed"


def test_native_matches_numpy(rng):
    ds = WindowedDataset(_clips(rng), window=64)
    idxs = rng.permutation(len(ds))[:50]

    native = ds._native_gather()
    assert native is not None
    src_n, trg_n = native(idxs)

    w = ds.window
    src_py = np.stack([ds.audio[ci][s: s + w] for ci, s in ds.table[idxs]])
    trg_py = np.stack([ds.facial[ci][s: s + w] for ci, s in ds.table[idxs]])
    np.testing.assert_array_equal(src_n, src_py)
    np.testing.assert_array_equal(trg_n, trg_py)


def test_gather_uses_native_and_shapes(rng):
    ds = WindowedDataset(_clips(rng), window=32)
    src, trg = ds.gather(np.arange(8))
    assert src.shape == (8, 32, 16) and trg.shape == (8, 32, 5)
    assert src.dtype == np.float32


def test_prefetch_preserves_order_and_content(rng):
    ds = WindowedDataset(_clips(rng), window=32)
    direct = list(ds.batches(16, shuffle=True, seed=3, drop_last=True))
    pre = list(prefetch(ds.batches(16, shuffle=True, seed=3, drop_last=True)))
    assert len(direct) == len(pre)
    for (a1, b1), (a2, b2) in zip(direct, pre):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)


def test_prefetch_propagates_errors():
    def bad():
        yield (np.zeros(1), np.zeros(1))
        raise ValueError("boom")

    it = prefetch(bad())
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_abandonment_releases_worker():
    """Abandoning the generator mid-epoch (step raised / Ctrl-C) must stop
    the worker thread instead of leaving it blocked forever on the bounded
    queue holding assembled (possibly device-resident) batches."""
    import threading
    import time

    produced = []

    def source():
        i = 0
        while True:  # infinite: would deadlock a plain q.put forever
            produced.append(i)
            yield (np.full(4, i), np.full(4, i))
            i += 1

    before = threading.active_count()
    it = prefetch(source(), depth=2)
    next(it)
    it.close()  # consumer abandons; finally sets the stop event
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"
    n_at_stop = len(produced)
    time.sleep(0.3)
    assert len(produced) == n_at_stop, "worker kept assembling after abandon"
