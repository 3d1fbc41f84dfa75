"""Batch loader: numpy batching + shuffling + host sharding + background
prefetch — the torch-DataLoader replacement (reference tools/builder.py:19-47).

Multi-host: each process loads its 1/num_processes shard of the sample index
space (``process_index``/``process_count``), mirroring DistributedSampler;
``set_epoch`` semantics come from seeding the shuffle with the epoch.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2, num_workers: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        # parallel batch-assembly threads (torch DataLoader num_workers
        # analogue). Threads, not processes: dataset __getitem__ is
        # file-IO + numpy (both release the GIL), and threads avoid the
        # fork-after-jax hazard. Batches are assigned round-robin and
        # yielded strictly in order, so the batch stream is byte-identical
        # to num_workers=1. Dataset __getitem__ must be thread-safe
        # (all bundled datasets are: in-memory arrays or per-call np.load).
        self.num_workers = max(1, int(num_workers))

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        if self.process_count > 1:
            # pad to even shards (DistributedSampler semantics: wrap around)
            per = -(-n // self.process_count)
            idx = np.concatenate([idx, idx[: per * self.process_count - n]])
            idx = idx[self.process_index::self.process_count]
        return idx

    def __len__(self):
        n = len(self._epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yields (points (B, N, 3) f32, labels (B,) i32) with prefetching."""
        idx = self._epoch_indices(epoch)
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)

        def make(bi):
            sel = idx[bi * self.batch_size : (bi + 1) * self.batch_size]
            pts, labels = zip(*(self.dataset[int(i)] for i in sel))
            return (np.stack(pts).astype(np.float32),
                    np.asarray(labels, np.int32))

        if self.prefetch <= 0:
            for bi in range(nb):
                yield make(bi)
            return

        W = min(self.num_workers, max(nb, 1))
        # ``prefetch`` is a SHARED budget (total buffered batches stays
        # ~prefetch + W regardless of W, not W*prefetch)
        per_q = max(1, -(-self.prefetch // W))
        qs = [queue.Queue(maxsize=per_q) for _ in range(W)]
        stop = threading.Event()

        def worker(w):
            try:
                for bi in range(w, nb, W):
                    item = make(bi)
                    # bounded put that a closed/abandoned generator can
                    # release — otherwise W threads (and their buffered
                    # batches) stay pinned per abandoned epoch
                    while not stop.is_set():
                        try:
                            qs[w].put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate loader errors to the consumer
                while not stop.is_set():
                    try:
                        qs[w].put(e, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        for w in range(W):
            threading.Thread(target=worker, args=(w,), daemon=True).start()
        try:
            # strict-order consumption: batch bi always comes from worker bi % W
            for bi in range(nb):
                item = qs[bi % W].get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)
