"""Training/eval data loaders: multi-process-free threaded prefetching with
per-host sharding.

Replaces detectron2's worker-process DataLoader (SURVEY.md section 3.1 "CPU
worker procs x8"): mapper work runs in a thread pool (numpy/cv2 release the
GIL for the heavy ops), batches are stacked and handed to JAX; sharding across
hosts follows ``jax.process_index()`` (SURVEY.md section 5 communication
backend note).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


def _stack(samples: List[Dict]) -> Dict[str, np.ndarray]:
    keys = [
        k for k, v in samples[0].items() if isinstance(v, np.ndarray)
    ]
    batch = {k: np.stack([s[k] for s in samples]) for k in keys}
    for k, v in samples[0].items():
        if k not in batch:
            batch[k] = [s[k] for s in samples]
    return batch


class TrainLoader:
    """Infinite shuffled loader over a dataset list with a mapper."""

    def __init__(
        self,
        dataset: List[Dict],
        mapper: Callable[[Dict], Dict],
        batch_size: int,
        *,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        assert batch_size % process_count == 0
        self.dataset = dataset
        self.mapper = mapper
        self.local_batch = batch_size // process_count
        self.rng = np.random.default_rng(seed + process_index)
        self.process_index = process_index
        self.process_count = process_count
        self.pool = ThreadPoolExecutor(num_workers)
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _indices(self) -> Iterator[int]:
        n = len(self.dataset)
        while True:
            perm = self.rng.permutation(n)
            # per-host shard of the shuffled stream
            shard = perm[self.process_index :: self.process_count]
            yield from shard

    def _producer(self):
        idx_iter = self._indices()
        while not self._stop.is_set():
            idxs = [next(idx_iter) for _ in range(self.local_batch)]
            futures = [
                self.pool.submit(self.mapper, self.dataset[i]) for i in idxs
            ]
            samples = [f.result() for f in futures]
            self.q.put(_stack(samples))

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return self.q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.pool.shutdown(wait=False)


def eval_loader(
    dataset: List[Dict],
    mapper: Callable[[Dict], Dict],
    *,
    process_index: int = 0,
    process_count: int = 1,
    num_workers: int = 8,
) -> Iterator[Dict]:
    """Ordered single-sample eval iterator, sharded across hosts.

    Streams lazily with a bounded in-flight window (2*num_workers) instead of
    mapping the whole shard eagerly — a 2000-image ADE20K val shard decoded
    up-front would hold ~2000 padded float32 images in host RAM."""
    from collections import deque

    shard = dataset[process_index::process_count]
    window = 2 * num_workers
    with ThreadPoolExecutor(num_workers) as pool:
        pending: deque = deque()
        it = iter(shard)
        for d in it:
            pending.append(pool.submit(mapper, d))
            if len(pending) >= window:
                break
        while pending:
            out = pending.popleft().result()
            for d in it:
                pending.append(pool.submit(mapper, d))
                break
            yield out
