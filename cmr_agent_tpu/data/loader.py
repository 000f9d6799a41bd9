"""Batching, prefetch and device placement.

Replaces torch ``DataLoader(num_workers=N)`` (Train_Geo.py:48-51) with a
thread-pool prefetcher (the sample pipeline is numpy/PIL/ctypes, which
release the GIL for the heavy parts) and adds what the reference never
had: sharded device placement over a ``jax.sharding.Mesh`` so multi-chip
data parallelism is a one-liner (SURVEY.md §2.7).
"""

from __future__ import annotations

import threading
from collections import deque
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


def _worker_collate(args) -> Dict[str, np.ndarray]:
    # The pool pickles the dataset ONCE at pool creation, so the epoch must
    # ride along with every task — a parent-side set_epoch never reaches
    # the worker's copy.
    epoch, idxs = args
    if hasattr(_WORKER_DATASET, "set_epoch"):
        _WORKER_DATASET.set_epoch(int(epoch))
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

    Worker model: ``num_workers`` threads share the index stream and fill
    a bounded reorder buffer (batches are yielded in order; at most
    ``prefetch`` completed batches are held). The per-sample pipeline's
    heavy parts (numpy, the ctypes native FPS/1-NN) release the GIL, so
    threads scale across cores without pickling 40 MB sample dicts.
    ``use_processes=True`` switches to a persistent spawn-based process
    pool for datasets whose ``__getitem__`` holds the GIL in Python code
    (the dataset must pickle; all shipped datasets do). The process path
    keeps the same ordering and bounds in-flight work to
    ``max(prefetch, num_workers)`` tasks (windowed submission — completed
    results are never buffered unboundedly), and threads the current
    epoch through each task so ``set_epoch`` reaches the workers' dataset
    copies.

    Args:
      dataset: map-style dataset (``__len__`` / ``__getitem__``).
      batch_size: samples per batch.
      shuffle: reshuffle indices each epoch (seeded, reproducible).
      drop_last: drop the ragged tail batch.
      num_workers: prefetch workers (0 = synchronous).
      seed: shuffle seed.
      prefetch: max completed batches held ahead of the consumer.
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
        self.prefetch = max(1, prefetch)
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

    def _iter_processes(self) -> Iterator[Dict[str, np.ndarray]]:
        pool = self._process_pool()
        batches = [np.asarray(i, dtype=np.int64)
                   for i in self._index_batches()]
        # Windowed submission: at most `window` tasks in flight, so
        # completed batches never pile up faster than the consumer
        # (Pool.imap's result handler buffers without bound).
        window = max(self.prefetch, self.num_workers)
        pending: deque = deque()
        submitted = 0
        for submitted in range(min(window, len(batches))):
            pending.append(pool.apply_async(
                _worker_collate, ((self._epoch, batches[submitted]),)))
        submitted = min(window, len(batches))
        while pending:
            out = pending.popleft().get()
            if submitted < len(batches):
                pending.append(pool.apply_async(
                    _worker_collate, ((self._epoch, batches[submitted]),)))
                submitted += 1
            yield out

    def _iter_threads(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = list(self._index_batches())
        n = len(batches)
        cond = threading.Condition()
        results: Dict[int, Dict[str, np.ndarray]] = {}
        state = {"next_in": 0, "next_out": 0, "stop": None}

        def worker():
            while True:
                with cond:
                    i = state["next_in"]
                    if i >= n or state["stop"] is not None:
                        return
                    state["next_in"] = i + 1
                try:
                    out = collate([self.dataset[int(j)]
                                   for j in batches[i]])
                except BaseException as e:  # propagate to the consumer
                    with cond:
                        state["stop"] = e
                        cond.notify_all()
                    return
                with cond:
                    # bound the reorder buffer to `prefetch` ahead of the
                    # consumer; the worker computing `next_out` never
                    # waits, so this cannot deadlock
                    while (i - state["next_out"] >= self.prefetch
                           and state["stop"] is None):
                        cond.wait()
                    results[i] = out
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(max(1, min(self.num_workers, n)))]
        for t in threads:
            t.start()
        try:
            for i in range(n):
                with cond:
                    while i not in results and state["stop"] is None:
                        cond.wait()
                    if state["stop"] is not None:
                        raise state["stop"]
                    out = results.pop(i)
                    state["next_out"] = i + 1
                    cond.notify_all()
                yield out
        finally:
            with cond:  # unblock workers if the consumer bailed early
                if state["stop"] is None and state["next_out"] < n:
                    state["stop"] = GeneratorExit()
                cond.notify_all()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            for idxs in self._index_batches():
                yield collate([self.dataset[int(i)] for i in idxs])
            return
        if self.use_processes:
            yield from self._iter_processes()
        else:
            yield from self._iter_threads()
