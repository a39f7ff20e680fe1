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
import weakref

import jax

_DONE = object()


def _worker(it, q, stop, to_device):
    # module-level target: holds NO reference to the Prefetcher, so the
    # wrapper can be garbage-collected (its finalizer stops this thread)
    try:
        for batch in it:
            if stop.is_set():
                return
            if to_device and batch is not None:
                batch = jax.tree.map(jax.device_put, batch)
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
        q.put(_DONE)
    except BaseException as e:  # re-raise in the consumer
        q.put(e)


class Prefetcher:
    """Wrap any batch iterator; pull up to `depth` batches ahead on a
    daemon thread, optionally moving arrays to device with
    `jax.device_put` as they are produced.

    Exceptions from the source iterator are re-raised at the consuming
    `next()` call. `close()` (or garbage collection of the wrapper —
    the worker keeps no reference to it) stops the thread and drops the
    queued batches; StopIteration propagates once the source is
    exhausted.
    """

    def __init__(self, it, depth: int = 2, to_device: bool = True):
        self._q = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=_worker,
            args=(iter(it), self._q, self._stop, to_device),
            daemon=True,
        )
        self._finalizer = weakref.finalize(
            self, _drain_and_stop, self._q, self._stop
        )
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._finalizer()


def _drain_and_stop(q, stop):
    stop.set()
    # drain so a blocked worker can exit (and queued device batches free)
    try:
        while True:
            q.get_nowait()
    except queue.Empty:
        pass
