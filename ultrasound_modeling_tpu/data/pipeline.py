"""HBM-resident batch pipeline.

The reference's loader (reference: Dataset_2.py:25-134) keeps NumPy arrays on
the host, runs per-sample Python-loop augmentation on every batch, then
converts to tensors.  Here the full dataset is moved to device memory once
(these datasets are small: thousands of 256x80x10 f32 frames), and batches are
produced by device-side gathers; augmentation + label2vec fuse into the jitted
train step.

Cursor/terminator semantics are preserved exactly (reference:
Dataset_2.py:88-134): ``next_train(bs)`` advances a cursor, returns
``terminator=True`` and resets when the end is reached, and substitutes the
tail window ``[-1-bs:-1]`` for a short final batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_npy_pair(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Split a raw ``[N, 1, H, W, C+2]`` ETL file into (x, y).

    Channel 0 is the label, the last channel is bMode (unused for training —
    reference: Dataset_2.py:33-43).
    """
    raw = np.load(path, allow_pickle=True)
    y = raw[:, 0, :, :, 0].astype(np.float32)
    x = raw[:, 0, :, :, 1:-1].astype(np.float32)
    return x, y


def load_npy_pair_reshaped(path: str, height: int = 256, width: int = 64,
                           channels: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """Standalone-ResNeSt variant: collapse the cycle dim and reshape to
    ``[-1, 256, 64, 6]`` (reference: TBI_ResNest.py:259-270)."""
    raw = np.load(path, allow_pickle=True)
    y = raw[..., 0].reshape([-1, height, width]).astype(np.float32)
    x = raw[..., 1:-1].reshape([-1, height, width, channels]).astype(np.float32)
    return x, y


def prefetch(iterable: Iterable, size: int = 2,
             place: Optional[Callable] = None) -> Iterator:
    """Double-buffered background prefetch: overlaps host batch prep (and
    optional device placement) with device compute.

    Replaces the reference's tf.data ``num_parallel_calls=AUTOTUNE`` host
    threading (reference: Dataset.py:17-18,26-28, MainParallel.py:52-57).
    ``place`` is applied in the producer thread (e.g. a sharded device_put),
    so the transfer is in flight while the previous step runs.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterable:
                q.put(place(item) if place is not None else item)
        except Exception as exc:  # propagate into the consumer
            err.append(exc)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


class _ShardRows:
    """Shared row cache over one out-of-core ETL shard (data.native_loader):
    x and y views of the same batch gather the rows once."""

    def __init__(self, path: str, n_threads: int = 4):
        from ultrasound_modeling_tpu.data.native_loader import NpyShard
        self.shard = NpyShard(path, n_threads=n_threads)
        self._key = None
        self._rows = None

    def rows(self, start: int, stop: int) -> np.ndarray:
        if self._key != (start, stop):
            idx = np.arange(start, stop, dtype=np.int64)
            self._rows = self.shard.gather(idx)[:, 0]  # strip the list dim
            self._key = (start, stop)
        return self._rows


class _ShardView:
    """Array-like view (shape + slicing) over a shard's x or y channels,
    satisfying the cursor API of ``Dataset`` without loading the file."""

    def __init__(self, rows: _ShardRows, kind: str):
        self._rows = rows
        self._kind = kind
        n, h, w, c = (rows.shard.shape[0],) + tuple(rows.shard.shape[2:])
        self.shape = (n, h, w, c - 2) if kind == "x" else (n, h, w)

    def __getitem__(self, sl) -> np.ndarray:
        start, stop, step = sl.indices(self.shape[0])
        assert step == 1
        rows = self._rows.rows(start, stop)
        if self._kind == "x":
            return np.ascontiguousarray(rows[..., 1:-1], dtype=np.float32)
        return np.ascontiguousarray(rows[..., 0], dtype=np.float32)


def _shard_views(path: str) -> Tuple["_ShardView", "_ShardView"]:
    rows = _ShardRows(path)
    return _ShardView(rows, "x"), _ShardView(rows, "y")


class Dataset:
    """Device-resident dataset with the reference's cursor semantics."""

    def __init__(self, x_tr, y_tr, x_te, y_te, num_classes: int = 3,
                 device_resident: bool = True):
        if device_resident:
            self.x_tr = jnp.asarray(x_tr)
            self.y_tr = jnp.asarray(y_tr)
            self.x_te = jnp.asarray(x_te)
            self.y_te = jnp.asarray(y_te)
        else:
            self.x_tr, self.y_tr, self.x_te, self.y_te = x_tr, y_tr, x_te, y_te
        # Out-of-core shards do synchronous host gathers in next_train; the
        # Trainer overlaps them with device compute via prefetch().
        self.device_resident = device_resident
        self.num_tr = int(self.x_tr.shape[0])
        self.num_te = int(self.x_te.shape[0])
        self.idx_tr = 0
        self.idx_te = 0
        self.num_classes = num_classes
        self.height = int(self.x_tr.shape[1])
        self.width = int(self.x_tr.shape[2])
        self.channel = int(self.x_tr.shape[3])

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_npy(cls, train_path: str, val_path: str, num_classes: int = 3,
                 reshaped: bool = False, out_of_core: bool = False
                 ) -> "Dataset":
        """``out_of_core=True`` keeps the shards on disk and assembles
        batches through the native mmap loader (native/npy_loader.cpp,
        threaded row gather) instead of loading everything into HBM — for
        archives larger than device/host memory."""
        if out_of_core:
            if reshaped:
                raise NotImplementedError(
                    "out_of_core + reshaped not supported")
            x_tr, y_tr = _shard_views(train_path)
            x_te, y_te = _shard_views(val_path)
            return cls(x_tr, y_tr, x_te, y_te, num_classes,
                       device_resident=False)
        load = load_npy_pair_reshaped if reshaped else load_npy_pair
        x_tr, y_tr = load(train_path)
        x_te, y_te = load(val_path)
        return cls(x_tr, y_tr, x_te, y_te, num_classes)

    @classmethod
    def synthetic(cls, n_train: int = 32, n_test: int = 8, seed: int = 0,
                  height: int = 256, width: int = 80, n_disp: int = 10,
                  num_classes: int = 3) -> "Dataset":
        from ultrasound_modeling_tpu.data import synthetic
        raw_tr = synthetic.make_raw_array(n_train, seed, height, width, n_disp)
        raw_te = synthetic.make_raw_array(n_test, seed + 1, height, width, n_disp)
        return cls(raw_tr[:, 0, :, :, 1:-1], raw_tr[:, 0, :, :, 0],
                   raw_te[:, 0, :, :, 1:-1], raw_te[:, 0, :, :, 0],
                   num_classes)

    # -- cursor API (reference: Dataset_2.py:85-134) ------------------------

    def reset_idx(self):
        self.idx_tr, self.idx_te = 0, 0

    def _next(self, x, y, idx: int, n: int, batch_size: int, fix: bool):
        start, end = idx, idx + batch_size
        terminator = end >= n
        new_idx = 0 if terminator else end
        if fix:
            new_idx = start
        if end > n:
            # Short final batch: substitute the tail window (Dataset_2.py:104-105).
            xb = x[-1 - batch_size:-1]
            yb = y[-1 - batch_size:-1]
        else:
            xb = jax.lax.dynamic_slice_in_dim(x, start, batch_size, axis=0) \
                if isinstance(x, jnp.ndarray) else x[start:end]
            yb = jax.lax.dynamic_slice_in_dim(y, start, batch_size, axis=0) \
                if isinstance(y, jnp.ndarray) else y[start:end]
        return xb, yb, terminator, new_idx

    def next_train(self, batch_size: int = 1, fix: bool = False):
        xb, yb, term, self.idx_tr = self._next(
            self.x_tr, self.y_tr, self.idx_tr, self.num_tr, batch_size, fix)
        return xb, yb, term

    def next_test(self, batch_size: int = 1):
        xb, yb, term, self.idx_te = self._next(
            self.x_te, self.y_te, self.idx_te, self.num_te, batch_size, False)
        return xb, yb, term

    # -- epoch iterators ----------------------------------------------------

    def train_epoch(self, batch_size: int,
                    shuffle_key: Optional[jax.Array] = None
                    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Yield full batches for one epoch; optionally shuffled on device."""
        n = self.num_tr
        if shuffle_key is not None:
            perm = jax.random.permutation(shuffle_key, n)
            x, y = self.x_tr[perm], self.y_tr[perm]
        else:
            x, y = self.x_tr, self.y_tr
        for start in range(0, n - batch_size + 1, batch_size):
            yield x[start:start + batch_size], y[start:start + batch_size]
        rem = n % batch_size
        if rem and n > batch_size:
            yield x[-1 - batch_size:-1], y[-1 - batch_size:-1]

    def test_epoch(self, batch_size: int):
        n = self.num_te
        for start in range(0, n - batch_size + 1, batch_size):
            yield (self.x_te[start:start + batch_size],
                   self.y_te[start:start + batch_size])
        rem = n % batch_size
        if rem and n > batch_size:
            yield self.x_te[-1 - batch_size:-1], self.y_te[-1 - batch_size:-1]
