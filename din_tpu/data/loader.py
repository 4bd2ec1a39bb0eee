"""Host-side batch loader with threaded prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(train_net.py:41-49): worker threads decode/resize JPEGs (PIL releases the
GIL inside libjpeg), batches are assembled as fixed-shape numpy arrays and
shipped uint8 so device transfer is 4x smaller than the reference's float32
(SURVEY.md §3.5), then (optionally) device_put with a sharding for
double-buffered host->device overlap.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def _stack_batch(samples):
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    """Shuffling, fixed-batch-size loader (drops the last partial batch so
    every step has identical shapes — one compiled program)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        nb = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(nb):
                idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                samples = list(pool.map(self.dataset.__getitem__, idx))
                yield _stack_batch(samples)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Background-thread prefetch + device_put (double buffering).

    ``sharding`` may be a Sharding or a callable batch -> Sharding (used to
    fall back to replication for remainder eval batches that don't divide
    the data axis)."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        for batch in iterator:
            s = sharding(batch) if callable(sharding) else sharding
            batch = jax.device_put(batch, s) if s is not None \
                else jax.device_put(batch)
            q.put(batch)
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
