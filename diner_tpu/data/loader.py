"""Host-side batch loader with background prefetch.

Replaces torch DataLoader (SURVEY.md §3.1 process boundaries): per-host index
sharding (the DistributedSampler equivalent) + a small thread pool decoding
PNGs while the device steps — IO overlap without torch worker processes.
"""

from __future__ import annotations

import queue
import threading
import time


import numpy as np

from diner_tpu.data.contract import collate, to_device_batch
from diner_tpu.parallel.mesh import process_local_slice


class BatchLoader:
    """Iterable over contract batches. shuffle=True reshuffles per epoch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True,
                 num_threads: int = 4, prefetch: int = 2,
                 shard_across_processes: bool = True,
                 arrays_only: bool = True, io_retries: int = 3):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.arrays_only = arrays_only
        self.io_retries = io_retries
        if shard_across_processes:
            # pad_to_equal: every host must see the SAME number of batches,
            # or the short host exhausts its iterator first and the others
            # block forever in the training step's collective
            self.indices = process_local_slice(len(dataset),
                                               pad_to_equal=True)
        else:
            self.indices = list(range(len(dataset)))
        self._epoch = 0

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self):
        idcs = np.array(self.indices)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idcs)
        return idcs

    def __iter__(self):
        idcs = self._epoch_indices()
        self._epoch += 1
        n_batches = len(self)
        if n_batches == 0:
            raise ValueError(
                f"BatchLoader yields no batches: {len(self.indices)} local "
                f"indices < batch_size={self.batch_size} with drop_last — "
                "shrink the batch or grow the dataset")
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()  # set when the consumer abandons the epoch
        error: list = []

        def put(item) -> bool:
            # bounded put that gives up when the consumer went away, so an
            # abandoned iterator (e.g. islice over the loader) cannot leave
            # this thread blocked forever holding its pool
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    def fetch(i):
                        # shared-filesystem races get blanket retries in the
                        # reference (facescape.py:218-289); bounded here
                        for attempt in range(self.io_retries):
                            try:
                                return self.dataset[int(i)]
                            except OSError:
                                if attempt == self.io_retries - 1:
                                    raise
                                time.sleep(0.5 * (attempt + 1))

                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        chunk = idcs[b * self.batch_size:(b + 1) * self.batch_size]
                        samples = list(pool.map(fetch, chunk))
                        batch = collate(samples)
                        if self.arrays_only:
                            batch = to_device_batch(batch)
                        if not put(batch):
                            return
            except BaseException as e:  # surface in the consumer, don't
                error.append(e)         # silently truncate the epoch
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            # generator closed/GC'd mid-epoch: release the producer
            stop.set()
