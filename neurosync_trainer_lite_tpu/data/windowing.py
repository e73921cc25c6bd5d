"""Lazy stride-1 windowing over per-clip feature arrays.

Window semantics match the reference (reference: dataset/dataset.py:58-98):
every 128-frame window at stride 1 (starts 0..T-128), plus one extra final
window [T-128, T) whenever T % 128 != 0 (in the reference this is the
"reflection tail" branch — since the segment is already exactly 128 frames,
the reflection fill is a no-op and the branch duplicates the last window; we
reproduce that example count exactly).

TPU-first design (fixes the reference's 128x memory blowup,
README.md:34 "128-256GB RAM"): windows are never materialized — the dataset
stores one (audio[T,256], facial[T,61]) pair per clip plus an [N,2] index
table of (clip, start), and batches are gathered on demand. 30 minutes of
augmented capture is ~250 MB instead of ~32 GB.

Split semantics: 90/10 random split over window indices (reference:
dataset.py:12-16 used an unseeded torch random_split; ours is deterministic
under Config.seed).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from neurosync_trainer_lite_tpu.config import Config


class WindowedDataset:
    """Windows over a list of (audio_features, facial_data) clip pairs."""

    def __init__(self, clips: list[tuple[np.ndarray, np.ndarray]],
                 window: int = 128, indices: np.ndarray | None = None):
        self.window = window
        self.audio = []
        self.facial = []
        table = []
        for ci, (a, f) in enumerate(clips):
            a = np.ascontiguousarray(a, dtype=np.float32)
            f = np.ascontiguousarray(f, dtype=np.float32)
            T = min(len(a), len(f))
            a, f = a[:T], f[:T]
            if T < window:
                print(f"skipping clip {ci}: {T} frames < window {window}")
                self.audio.append(a)
                self.facial.append(f)
                continue
            self.audio.append(a)
            self.facial.append(f)
            starts = list(range(0, T - window + 1))
            if T % window != 0:
                starts.append(T - window)  # duplicated tail window (see above)
            table.extend((ci, s) for s in starts)
        if indices is not None:
            self.table = indices
        else:
            self.table = np.asarray(table, dtype=np.int64).reshape(-1, 2)

    def __len__(self) -> int:
        return len(self.table)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        ci, s = self.table[idx]
        w = self.window
        return self.audio[ci][s: s + w], self.facial[ci][s: s + w]

    def _native_gather(self):
        """Build (once) the C++ OpenMP batch assembler; None if unavailable."""
        if not hasattr(self, "_native"):
            try:
                from neurosync_trainer_lite_tpu.data.native import NativeGather
                self._native = NativeGather(self.audio, self.facial,
                                            self.table, self.window)
            except (RuntimeError, AssertionError, IndexError):
                self._native = None
        return self._native

    def gather(self, idxs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch gather → (src[B,W,256], trg[B,W,61]) float32."""
        native = self._native_gather()
        if native is not None:
            return native(np.asarray(idxs))
        w = self.window
        src = np.stack([self.audio[ci][s: s + w] for ci, s in self.table[idxs]])
        trg = np.stack([self.facial[ci][s: s + w] for ci, s in self.table[idxs]])
        return src, trg

    def split(self, val_fraction: float, seed: int
              ) -> tuple["_View", "_View"]:
        """Deterministic shuffled split into (train, val) views."""
        perm = np.random.default_rng(seed).permutation(len(self.table))
        n_val = int(len(perm) * val_fraction)
        return (_View(self, perm[n_val:]), _View(self, perm[:n_val]))

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_last: bool = False,
                wrap: bool = False) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        return _iterate(self, np.arange(len(self)), batch_size,
                        shuffle=shuffle, seed=seed, drop_last=drop_last,
                        wrap=wrap)

    def index_batches(self, batch_size: int, *, shuffle: bool = False,
                      seed: int = 0, drop_last: bool = False,
                      wrap: bool = False) -> Iterator[np.ndarray]:
        """Same order as batches(), but yields base-index chunks ungathered."""
        return _iter_index_chunks(np.arange(len(self)), batch_size,
                                  shuffle=shuffle, seed=seed,
                                  drop_last=drop_last, wrap=wrap)


class _View:
    """An index-subset view over a WindowedDataset."""

    def __init__(self, base: WindowedDataset, idxs: np.ndarray):
        self.base = base
        self.idxs = np.asarray(idxs)

    def __len__(self) -> int:
        return len(self.idxs)

    def __getitem__(self, i: int):
        return self.base[self.idxs[i]]

    def gather(self, idxs: np.ndarray):
        return self.base.gather(self.idxs[idxs])

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 0, drop_last: bool = False, wrap: bool = False):
        return _iterate(self.base, self.idxs, batch_size, shuffle=shuffle,
                        seed=seed, drop_last=drop_last, wrap=wrap)

    def index_batches(self, batch_size: int, *, shuffle: bool = False,
                      seed: int = 0, drop_last: bool = False,
                      wrap: bool = False) -> Iterator[np.ndarray]:
        """Same order as batches(), but yields base-index chunks ungathered."""
        return _iter_index_chunks(self.idxs, batch_size, shuffle=shuffle,
                                  seed=seed, drop_last=drop_last, wrap=wrap)


def _iter_index_chunks(idxs: np.ndarray, batch_size: int, *,
                       shuffle: bool, seed: int, drop_last: bool, wrap: bool
                       ) -> Iterator[np.ndarray]:
    """The batch ORDER logic, yielding base-index chunks without gathering —
    multi-process feeding assembles only each process's addressable rows from
    these chunks (parallel/distributed.py:assemble_sharded_batch)."""
    order = np.array(idxs)
    if shuffle:
        order = np.random.default_rng(seed).permutation(order)
    n = len(order)
    if wrap and n > 0 and n % batch_size != 0:
        # pad the final batch by cycling indices to keep shapes static for
        # jit and divisible for mesh sharding — also when the whole view is
        # smaller than one batch (tiny validation splits)
        pad = batch_size - n % batch_size
        reps = np.concatenate([order] * (pad // n + 1))
        order = np.concatenate([order, reps[:pad]])
    stop = (n // batch_size * batch_size) if drop_last else len(order)
    for i in range(0, stop, batch_size):
        chunk = order[i: i + batch_size]
        if drop_last and len(chunk) < batch_size:
            break
        yield chunk


def _iterate(base: WindowedDataset, idxs: np.ndarray, batch_size: int, *,
             shuffle: bool, seed: int, drop_last: bool, wrap: bool):
    for chunk in _iter_index_chunks(idxs, batch_size, shuffle=shuffle,
                                    seed=seed, drop_last=drop_last, wrap=wrap):
        yield base.gather(chunk)


def prefetch(iterator, put=None, depth: int = 2):
    """Run batch assembly (and optional host→device transfer) in a background
    thread, `depth` batches ahead of the consumer — overlaps the native gather
    + device_put with the device step (the reference's torch DataLoader
    workers played this role; here one thread + the OpenMP gather suffice
    since windows are index arithmetic, not per-example transforms).
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()  # set when the consumer abandons the generator

    def _offer(item) -> bool:
        # bounded-queue put that gives up once the consumer is gone —
        # a plain q.put would block forever when an epoch aborts mid-way
        # (step raised / Ctrl-C), pinning the thread plus up to `depth`
        # assembled (possibly device-resident) batches for process lifetime
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _offer(tuple(put(x) for x in item)
                              if put is not None else item):
                    return
            _offer(sentinel)
        except BaseException as e:  # propagate into the consumer
            _offer(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def prepare_datasets(cfg: Config, clips=None):
    """Load clips from cfg.root_dir (or use the given list) and return
    (dataset, train_view, val_view) with a deterministic 90/10 split
    (reference: dataset.py:12-21)."""
    if clips is None:
        from neurosync_trainer_lite_tpu.data.processing import load_data

        clips = load_data(cfg.root_dir, cfg.sr, ffmpeg_path=cfg.ffmpeg_path)
    ds = WindowedDataset(clips, window=cfg.micro_batch_size)
    train, val = ds.split(cfg.val_split, cfg.seed)
    return ds, train, val
