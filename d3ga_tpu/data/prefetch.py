"""Background batch prefetcher: overlap host-side batch assembly (and
optionally the host->device transfer) with device compute.

The reference gets this from torch DataLoader worker processes
(`/root/reference/train.py:161-170`, num_workers/prefetch_factor); here
a single daemon thread is enough — batch assembly is numpy-light and
the expensive part is hiding the host->device copy behind the previous
step's compute (jax dispatch is async, so `jax.device_put` issued from
the prefetch thread overlaps naturally).
"""

import queue
import threading

import jax


class Prefetcher:
    """Wrap any batch iterator; pull up to `depth` batches ahead on a
    daemon thread, optionally moving arrays to device with
    `jax.device_put` as they are produced.

    Exceptions from the source iterator are re-raised at the consuming
    `next()` call. `close()` (or garbage collection) stops the thread;
    StopIteration propagates once the source is exhausted.
    """

    _DONE = object()

    def __init__(self, it, depth: int = 2, to_device: bool = True):
        self._it = iter(it)
        self._q = queue.Queue(maxsize=max(1, depth))
        self._to_device = to_device
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                if self._stop.is_set():
                    return
                if self._to_device and batch is not None:
                    batch = jax.tree.map(jax.device_put, batch)
                # block while the queue is full, but wake on close()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(self._DONE)
        except BaseException as e:  # re-raise in the consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so a blocked worker can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # pragma: no cover - GC timing
        self.close()
