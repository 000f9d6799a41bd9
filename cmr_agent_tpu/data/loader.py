"""Batching, prefetch and device placement.

Replaces torch ``DataLoader(num_workers=N)`` (Train_Geo.py:48-51) with a
thread-pool prefetcher (the sample pipeline is numpy/PIL, which release the
GIL for the heavy parts) and adds what the reference never had: sharded
device placement over a ``jax.sharding.Mesh`` so multi-chip data
parallelism is a one-liner (SURVEY.md §2.7).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Sequence

import numpy as np
import jax


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


_WORKER_DATASET = None


def _init_worker(dataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_collate(idxs) -> Dict[str, np.ndarray]:
    return collate([_WORKER_DATASET[int(i)] for i in idxs])


def shard_batch(batch: Dict[str, np.ndarray], mesh=None,
                batch_axis: str = "dp") -> Dict[str, jax.Array]:
    """Device-put a batch; shard the leading axis over ``mesh[batch_axis]``."""
    if mesh is None:
        return {k: jax.device_put(v) for k, v in batch.items()}
    from jax.sharding import NamedSharding, PartitionSpec as P
    def put(v):
        spec = P(batch_axis, *([None] * (v.ndim - 1)))
        return jax.device_put(v, NamedSharding(mesh, spec))
    return {k: put(v) for k, v in batch.items()}


class DataLoader:
    """Iterable over collated batches with background prefetch.

    Worker model: the per-sample pipeline's heavy parts (numpy, the ctypes
    native FPS/1-NN) release the GIL, so the default thread pool scales
    across cores without pickling 40 MB sample dicts. ``use_processes=True``
    switches to a persistent spawn-based process pool for datasets whose
    ``__getitem__`` holds the GIL in Python code (the dataset must pickle;
    all shipped datasets do).

    Args:
      dataset: map-style dataset (``__len__`` / ``__getitem__``).
      batch_size: samples per batch.
      shuffle: reshuffle indices each epoch (seeded, reproducible).
      drop_last: drop the ragged tail batch.
      num_workers: prefetch workers (0 = synchronous).
      seed: shuffle seed.
      use_processes: worker processes instead of threads.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, num_workers: int = 2,
                 seed: int = 0, prefetch: int = 4,
                 use_processes: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.prefetch = prefetch
        self.use_processes = use_processes
        self._epoch = 0
        self._pool = None

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")  # never fork a JAX/TPU process
            self._pool = ctx.Pool(self.num_workers, initializer=_init_worker,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):  # best-effort; close() is the explicit path
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed, self._epoch)).permutation(n)
        stop = (n // self.batch_size * self.batch_size
                if self.drop_last else n)
        for s in range(0, stop, self.batch_size):
            yield order[s:s + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            for idxs in self._index_batches():
                yield collate([self.dataset[int(i)] for i in idxs])
            return

        if self.use_processes:
            pool = self._process_pool()
            batches = [np.asarray(i, dtype=np.int64)
                       for i in self._index_batches()]
            for batch in pool.imap(_worker_collate, batches,
                                   chunksize=1):
                yield batch
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches())
        stop = object()

        def worker():
            try:
                for idxs in batches:
                    q.put(collate([self.dataset[int(i)] for i in idxs]))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
