"""Host→device input prefetching.

The reference overlaps data loading with compute via DataLoader worker
processes (cifar.py:361-366); the TPU-native equivalent is a small
staging thread that runs the host-side convert + device_put for the
next batches while the current step is dispatching, so the accelerator
never waits on the host transfer (the JAX step dispatch itself is
already asynchronous).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

__all__ = ["device_prefetch"]

_END = object()


def device_prefetch(loader: Iterable, put: Callable, depth: int = 2) -> Iterator:
    """Yield ``put(item)`` for each item of ``loader``, staged ``depth``
    batches ahead in a background thread.

    ``put`` runs in the worker thread — it should do the numpy→device
    conversion/sharding (device_put is thread-safe and asynchronous).
    ``depth`` bounds device memory held by staged batches; ``depth<=0``
    disables staging (plain inline mapping).  Worker exceptions are
    re-raised at the consuming site.
    """
    if depth <= 0:
        for item in loader:
            yield put(item)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def enqueue(item) -> bool:
        # bounded put that notices consumer abandonment, so the worker
        # never parks forever holding staged device batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in loader:
                if not enqueue(put(item)):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            enqueue((_END, e))
            return
        enqueue((_END, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if (isinstance(item, tuple) and len(item) == 2
                    and item[0] is _END):
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        # consumer done or abandoned (exception / early exit): release
        # the worker and drop any staged batches
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
