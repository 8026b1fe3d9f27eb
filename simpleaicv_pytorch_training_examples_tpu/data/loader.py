"""Host-side input pipeline.

TPU-native replacement for torch DataLoader + DistributedSampler
(/root/reference/tools/train_classification_model.py:72-92): a threaded
prefetching loader over map-style datasets producing fixed-shape collated
numpy batches, sharded across JAX processes (each process loads only its
own slice of the global batch, like DistributedSampler), with per-epoch
reshuffling via `set_epoch` semantics folded into the iterator.

Threads (not processes) are enough here because the heavy per-sample work
is cv2/numpy which releases the GIL; batches overlap with device compute
via a small prefetch queue, and `parallel.shard_batch` turns each batch
into one sharded global device array (the H2D double-buffer).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class Compose:
    """transforms.Compose equivalent over dict samples."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class DataLoader:
    """Iterates collated batches for this process's shard of the dataset.

    Args:
      dataset: map-style object with __len__/__getitem__ -> dict sample.
      batch_size: GLOBAL batch size (reference semantics: config.batch_size
        is total across devices; entry divides by device count only for the
        loader worker split, the global array stays whole).
      collater: callable samples -> batch dict.
      shuffle: reshuffle each epoch (seeded, epoch-folded).
      drop_last: drop trailing partial batch (train). Eval keeps it.
      process_index/process_count: jax.process_index()/count() for multihost.
    """

    def __init__(self, dataset, batch_size, collater, shuffle=True,
                 drop_last=True, seed=0, num_workers=8, prefetch=4,
                 process_index=0, process_count=1):
        self.dataset = dataset
        self.global_batch_size = batch_size
        assert batch_size % process_count == 0
        self.local_batch_size = batch_size // process_count
        self.collater = collater
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        # more threads than cores only adds GIL/context-switch thrash for
        # the numpy/PIL portions that hold the GIL
        # (tools/perf/loader_bench.py)
        import os
        self.num_workers = max(1, min(num_workers, os.cpu_count() or 8))
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return (n + self.global_batch_size - 1) // self.global_batch_size

    def _epoch_indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState((self.seed + self.epoch) % (2**31))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        n_batches = len(self)
        for b in range(n_batches):
            start = b * self.global_batch_size
            global_idx = order[start:start + self.global_batch_size]
            # this process's contiguous slice of the global batch
            lo = self.process_index * self.local_batch_size
            hi = lo + self.local_batch_size
            yield global_idx[lo:hi]

    def __iter__(self):
        out_q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            """Blocking put that gives up when the consumer is gone, so a
            full queue can never wedge the producer thread."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # A raising __getitem__/collater must surface in the consumer,
            # not kill this thread silently (which would block the consumer
            # on get() forever): ship the exception through the queue.
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in self._epoch_indices():
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__,
                                     [int(i) for i in batch_idx]))
                        if not put(self.collater(samples)):
                            return
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                put(exc)
                return
            put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
