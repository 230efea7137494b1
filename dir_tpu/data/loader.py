"""Threaded prefetching batch loader.

Replaces the reference's ``DataLoader(num_workers=16, pin_memory=True)``
(train.py:208-220) with a thread-pool pipeline: per-sample decode/augment
runs in worker threads (cv2/numpy release the GIL for the heavy parts)
while the accelerator consumes the previous batch. Batches are collated
into contiguous numpy arrays ready for ``jax.device_put`` with a sharded
layout.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class BatchLoader:
    """Iterable over shuffled, collated batches with background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, num_threads: int = 4,
                 prefetch: int = 2, seed: int = 0,
                 pad_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch counter (shuffle order seed + dataset aug
        stream) — called by the trainer each epoch so a resumed run
        replays the identical schedule (reference restores last_epoch,
        train.py:127-135)."""
        self._epoch = epoch

    def _index_batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self._seed + self._epoch)
            rng.shuffle(idx)
        batches = []
        for s in range(0, n, self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_last:
                    # Static shapes for XLA: repeat the last sample and
                    # report the real count so metrics can mask padding.
                    pad = np.full(self.batch_size - len(chunk), chunk[-1])
                    batches.append((np.concatenate([chunk, pad]), len(chunk)))
                    continue
            batches.append((chunk, len(chunk)))
        return batches

    def peek_batch(self) -> Dict[str, np.ndarray]:
        """The first batch, built synchronously: no prefetch thread to
        leak, no epoch advance. For one-off uses like int8 static-scale
        calibration (apps/eval.py --quant_static), where abandoning a
        started iterator would leave the producer blocked on q.put."""
        chunk, valid = self._index_batches()[0]
        batch = collate([self.dataset[i] for i in chunk])
        batch["_valid"] = np.asarray(valid, np.int32)
        return batch

    def __iter__(self) -> Iterator:
        return self.iter_from(0)

    def iter_from(self, start: int) -> Iterator:
        """Iterate from batch index ``start`` in the SAME deterministic
        order __iter__ would use this epoch — skipped batches are never
        decoded. Lets a resumed offline eval (apps/eval.py) fast-forward
        past already-accumulated batches at zero decode cost."""
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = self._epoch
        batches = self._index_batches()[start:]
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_interruptible(item) -> bool:
            # q.put with a stop check: a plain blocking put deadlocks
            # the producer forever if the consumer abandons the
            # generator while the queue is full (stop was only checked
            # between batches).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for chunk, valid in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, chunk))
                    batch = collate(samples)
                    batch["_valid"] = np.asarray(valid, np.int32)
                    if not put_interruptible(batch):
                        return
            put_interruptible(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
