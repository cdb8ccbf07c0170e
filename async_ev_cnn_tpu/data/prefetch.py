"""Background batch prefetching: host-side workers + device double-buffering.

The reference keeps a pool of daemon ``multiprocessing.Process`` workers
feeding a queue, with the preprocessing closure shipped via dill
(/root/reference/src/readers/event_reader.py:230-276) and blocks until the
queue is full on first use (event_reader.py:258-260).  Here:

* :class:`Prefetcher` — persistent background *threads* by default (numpy
  decode releases the GIL; threads avoid re-opening the dataset per worker)
  or *processes* (``mode='process'``, dill-pickled preprocessing fn) for
  CPU-bound preprocessing.
* :func:`device_prefetch` — wraps any host batch iterator with
  ``jax.device_put`` double-buffering so H2D transfer of batch t+1 overlaps
  compute of batch t.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

_ERR = "__prefetch_error__"  # queue sentinel: ('__prefetch_error__', repr)


def _mp_worker(q, blob, worker_id, num, batch_size, split):
    """Module-level process-mode worker: everything (dataset + fn) ships
    in the dill blob, so the worker survives spawn-based start methods —
    a nested closure target crashed mp.Process.start() on platforms
    where fork isn't the default."""
    import dill

    save, fn = dill.loads(blob)
    # shard the file space by worker to avoid duplicate reads
    for s in ("train", "validation", "test"):
        save._files[s] = save._files[s][worker_id::num] or save._files[s]
        save._labels[s] = save._labels[s][worker_id::num] or save._labels[s]
        save._epoch_order[s] = np.arange(len(save._files[s]))
        save._cursors[s] = 0
    try:
        while True:
            q.put(save.next_batch(batch_size, dataset=split,
                                  preprocessing_fn=fn, threads=1))
    except BaseException as e:  # noqa: BLE001 — surfaced in the consumer
        q.put((_ERR, repr(e)))


class Prefetcher:
    """Keeps up to ``queue_size`` ready batches ahead of the consumer.

    A worker failure (empty split, too-many-unreadable-examples, a bug in
    the preprocessing fn) is re-raised from :meth:`get` — silent worker
    death used to leave the consumer blocked forever.
    """

    def __init__(self, dataset, batch_size, split, preprocessing_fn,
                 num_workers=2, queue_size=4, mode="thread"):
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._workers = []
        if mode == "thread":
            # one puller thread per worker; cursor advancement is
            # serialized by the dataset's Lock (_next_files).
            def work():
                try:
                    while not self._stop.is_set():
                        batch = dataset.next_batch(
                            batch_size, dataset=split,
                            preprocessing_fn=preprocessing_fn, threads=1,
                        )
                        while not self._stop.is_set():
                            try:
                                self._queue.put(batch, timeout=0.1)
                                break
                            except queue.Full:
                                continue
                except BaseException as e:  # noqa: BLE001
                    self._put_error(e)

            for _ in range(num_workers):
                t = threading.Thread(target=work, daemon=True)
                t.start()
                self._workers.append(t)
        elif mode == "process":
            import dill
            import multiprocessing as mp

            blob = dill.dumps((dataset, preprocessing_fn))
            self._mp_queue: "mp.Queue" = mp.Queue(maxsize=queue_size)

            for i in range(num_workers):
                p = mp.Process(
                    target=_mp_worker,
                    args=(self._mp_queue, blob, i, num_workers, batch_size,
                          split),
                    daemon=True,
                )
                p.start()
                self._workers.append(p)

            def pump():
                while not self._stop.is_set():
                    try:
                        item = self._mp_queue.get(timeout=0.1)
                    except queue.Empty:
                        continue
                    while not self._stop.is_set():
                        try:  # bounded put: stop() must not strand the
                            self._queue.put(item, timeout=0.1)  # pump
                            break
                        except queue.Full:
                            continue

            t = threading.Thread(target=pump, daemon=True)
            t.start()
        else:
            raise ValueError(f"unknown prefetch mode {mode!r}")

    def _put_error(self, exc):
        while not self._stop.is_set():
            try:
                self._queue.put((_ERR, repr(exc)), timeout=0.1)
                return
            except queue.Full:
                continue

    def get(self, timeout=None):
        item = self._queue.get(timeout=timeout)
        # == not `is`: the process-mode sentinel crosses pickling and
        # comes back as a different str object
        if isinstance(item, tuple) and len(item) == 2 and item[0] == _ERR:
            raise RuntimeError(f"prefetch worker failed: {item[1]}")
        return item

    def __iter__(self):
        while True:
            yield self.get()

    def stop(self):
        self._stop.set()
        for w in self._workers:
            if hasattr(w, "terminate"):
                w.terminate()


def device_prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Double-buffer host batches onto the default device."""
    import collections

    import jax

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out
