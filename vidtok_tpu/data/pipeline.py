"""Async host pipeline: threaded decode workers + device prefetch.

Replaces torch DataLoader workers (reference datamodule.py:24-39) with a
thread pool (cv2/PIL release the GIL during decode) feeding a bounded queue,
plus a device-prefetch stage that keeps the next batch already transferred
(double buffering) so TPU steps never wait on H2D copies.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class ThreadedLoader:
    """Iterate a map-style dataset with worker threads and batching."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 epoch_len: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.epoch_len = epoch_len

    def __len__(self):
        n = self.epoch_len or len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_stream(self, epoch: int):
        n = len(self.dataset)
        order = np.arange(self.epoch_len or n) % n
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(order)
        return order

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        order = self._index_stream(epoch)
        usable = (len(order) // self.batch_size * self.batch_size
                  if self.drop_last else len(order))
        order = order[:usable]

        item_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 4)
        sentinel = object()

        def worker(worker_id: int):
            for j in range(worker_id, len(order), self.num_workers):
                try:
                    item_q.put((j, self.dataset[int(order[j])]))
                except Exception as e:  # propagate
                    item_q.put((j, e))
            item_q.put((None, sentinel))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()

        buf = {}
        done_workers = 0
        next_j = 0
        batch = []
        while done_workers < self.num_workers or buf or batch:
            if next_j in buf:
                item = buf.pop(next_j)
            else:
                if done_workers == self.num_workers and not buf:
                    break
                j, item = item_q.get()
                if item is sentinel:
                    done_workers += 1
                    continue
                if j != next_j:
                    buf[j] = item
                    continue
            if isinstance(item, Exception):
                raise item
            next_j += 1
            batch.append(item)
            if len(batch) == self.batch_size:
                yield _collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield _collate(batch)


def _collate(items):
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


def device_prefetch(iterator, put: Callable, depth: int = 2):
    """Wrap a host batch iterator with async device transfer (depth-deep)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        for b in iterator:
            q.put(put(b))
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is sentinel:
            return
        yield b
