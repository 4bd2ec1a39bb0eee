"""Host-side batch loader with threaded prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(train_net.py:41-49): worker threads decode/resize JPEGs (PIL releases the
GIL inside libjpeg), batches are assembled as fixed-shape numpy arrays and
shipped uint8 so device transfer is 4x smaller than the reference's float32
(SURVEY.md §3.5), then (optionally) device_put with a sharding for
double-buffered host->device overlap.

Multi-host: every process shuffles the SAME global permutation (shared
seed), then takes a strided per-process slice — disjoint and exhaustive
host shards with no coordination (din_tpu/parallel/multihost.py).

Remainder batches: ``pad_last=True`` cycles samples from the short batch up
to ``batch_size`` and emits a ``sample_mask`` (1=real, 0=pad), keeping every
eval step the same shape — one compiled program, masked out of the metrics
by compute_losses (din_tpu/train/losses.py).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def _stack_batch(samples):
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class BatchLoader:
    """Shuffling, fixed-batch-size loader.

    ``drop_last=True`` drops the final partial batch (training —
    identical shapes, one compiled program); ``pad_last=True`` instead pads
    it by cycling and marks the padding in ``batch['sample_mask']``.
    ``batch_size`` is the *per-process* batch size.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 pad_last: bool = False,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 decode_ahead: int = 2):
        import os
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # never oversubscribe the host: sample-level threads beyond the
        # core count only thrash (single-core machines: 1 worker; the
        # decode still overlaps device compute via prefetch_to_device)
        self.num_workers = max(1, min(num_workers, os.cpu_count() or 1))
        self.seed = seed
        self.drop_last = drop_last and not pad_last
        self.pad_last = pad_last
        self.process_index = process_index or 0
        self.process_count = process_count or 1
        self.decode_ahead = max(1, decode_ahead)
        self.epoch = 0
        self._skip = 0

    def set_epoch(self, epoch: int, skip_batches: int = 0) -> None:
        """Pin the shuffle epoch (torch ``DistributedSampler.set_epoch``
        convention): data order becomes a pure function of (seed, epoch),
        so a resumed run sees the same order as an uninterrupted one.
        ``skip_batches`` drops the first n batches of the NEXT iteration
        without decoding them — exact mid-epoch resume (train/preempt.py).
        Without set_epoch the loader keeps its legacy auto-increment."""
        self.epoch = epoch
        self._skip = skip_batches

    def _local_count(self) -> int:
        return len(range(self.process_index, len(self.dataset),
                         self.process_count))

    def __len__(self):
        n = self._local_count()
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # same seed on every host -> same permutation -> disjoint shards
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        if self.process_count > 1:
            order = order[self.process_index::self.process_count]
        if hasattr(self.dataset, "set_epoch"):
            # pin the dataset's per-item draws (frame sampling, hflip) to
            # this iteration's epoch: item content becomes a pure function
            # of (seed, epoch, index) even with concurrent decode threads
            self.dataset.set_epoch(self.epoch)
        self.epoch += 1
        nb = len(self)
        if self._skip:
            # mid-epoch resume: drop already-consumed batches index-only
            # (no decode); every process skips the same count
            order = order[self._skip * self.batch_size:]
            nb = max(0, nb - self._skip)
            self._skip = 0
        # decode-ahead ring buffer: sample futures for up to `decode_ahead`
        # upcoming batches are in flight while the current batch is consumed
        # (on top of this, prefetch_to_device overlaps the host->device copy)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            ring = []

            def submit(b):
                idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                n_real = len(idx)
                if self.pad_last and n_real < self.batch_size:
                    idx = np.resize(idx, self.batch_size)   # cycle
                ring.append((n_real,
                             [pool.submit(self.dataset.__getitem__, i)
                              for i in idx]))

            next_b = 0
            while next_b < min(self.decode_ahead, nb):
                submit(next_b)
                next_b += 1
            while ring:
                n_real, futures = ring.pop(0)
                samples = [f.result() for f in futures]
                if next_b < nb:
                    submit(next_b)
                    next_b += 1
                batch = _stack_batch(samples)
                if self.pad_last:
                    mask = np.zeros(self.batch_size, np.float32)
                    mask[:n_real] = 1.0
                    batch["sample_mask"] = mask
                yield batch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Background-thread prefetch + device_put (double buffering).

    ``sharding`` may be a Sharding or a callable batch -> Sharding (used to
    fall back to replication for batch sizes that don't divide the data
    axis)."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        # ANY exception (corrupt JPEG in the wrapped iterator, device_put
        # failure) must reach the consumer: a bare-dying producer thread
        # would leave the training loop blocked on q.get() forever — a
        # silent freeze indistinguishable from a device wedge.
        try:
            for batch in iterator:
                s = sharding(batch) if callable(sharding) else sharding
                batch = jax.device_put(batch, s) if s is not None \
                    else jax.device_put(batch)
                q.put(batch)
            q.put(sentinel)
        except BaseException as e:                  # noqa: BLE001
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
