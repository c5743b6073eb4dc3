"""Threaded prefetching batch loader.

The reference relies on torch DataLoader with 8 worker processes
(/root/reference/train.py:138-142); the host work here is far lighter
(no pyramid/kNN — that runs on device), so a thread pool with double
buffering keeps the TPU fed.  Batches are plain stacked NumPy dicts.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Iterator

import numpy as np


def _collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if np.isscalar(vals[0]) or isinstance(vals[0], (int, float)):
            out[k] = np.asarray(vals)
        else:
            out[k] = np.stack(vals)
    return out


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        to_device: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        # stage batches on the accelerator from the producer thread so the
        # host->device copy overlaps the previous step's compute (the
        # reference pays a blocking .to(device) per tensor per step,
        # train.py:192-217)
        self.to_device = to_device

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    batch = _collate(samples)
                    if self.to_device:
                        import jax

                        index = batch.pop("index", None)
                        batch = jax.device_put(batch)
                        if index is not None:
                            batch["index"] = index
                    q.put(batch)
            q.put(None)

        th = threading.Thread(target=produce, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
