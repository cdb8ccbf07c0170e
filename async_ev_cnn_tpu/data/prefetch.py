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


class Prefetcher:
    """Keeps up to ``queue_size`` ready batches ahead of the consumer."""

    def __init__(self, dataset, batch_size, split, preprocessing_fn,
                 num_workers=2, queue_size=4, mode="thread"):
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._workers = []
        if mode == "thread":
            # one puller thread per worker; cursor advancement is serialized
            # inside the dataset (GIL) exactly like the reference's Lock.
            def work():
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

            for _ in range(num_workers):
                t = threading.Thread(target=work, daemon=True)
                t.start()
                self._workers.append(t)
        elif mode == "process":
            import dill
            import multiprocessing as mp

            fn_blob = dill.dumps(preprocessing_fn)
            self._mp_queue: "mp.Queue" = mp.Queue(maxsize=queue_size)
            save = dataset  # shipped via fork; workers get their own cursors

            def mp_work(q, blob, worker_id, num):
                fn = dill.loads(blob)
                # shard the file space by worker to avoid duplicate reads
                for s in ("train", "validation", "test"):
                    save._files[s] = save._files[s][worker_id::num] or save._files[s]
                    save._labels[s] = save._labels[s][worker_id::num] or save._labels[s]
                    save._epoch_order[s] = np.arange(len(save._files[s]))
                    save._cursors[s] = 0
                while True:
                    q.put(save.next_batch(batch_size, dataset=split,
                                          preprocessing_fn=fn, threads=1))

            for i in range(num_workers):
                p = mp.Process(target=mp_work,
                               args=(self._mp_queue, fn_blob, i, num_workers),
                               daemon=True)
                p.start()
                self._workers.append(p)

            def pump():
                while not self._stop.is_set():
                    try:
                        item = self._mp_queue.get(timeout=0.1)
                    except queue.Empty:
                        continue
                    self._queue.put(item)

            t = threading.Thread(target=pump, daemon=True)
            t.start()
        else:
            raise ValueError(f"unknown prefetch mode {mode!r}")

    def get(self, timeout=None):
        return self._queue.get(timeout=timeout)

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
