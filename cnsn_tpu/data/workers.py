"""Multiprocess host-augmentation workers.

The reference overlaps its PIL AugMix cost with device compute via
DataLoader worker *processes* (cifar.py:361-366, imagenet.py:482-505).
A thread pool cannot reproduce that here: the AugMix op chain is
GIL-bound Python/PIL, so threads serialize at ~1 core.  This module
gives both host loaders the same process fan-out:

* ``PrefetchPool`` — a persistent ``multiprocessing.Pool`` plus
  one-batch-ahead double buffering: batch k+1 is augmenting in the
  workers while the trainer consumes batch k.
* Parity by construction: every image's view set is a pure function of
  ``(pixels-or-path, seed)``; the serial path and the pool path call
  the *same module-level function* with the *same per-image seeds*, so
  outputs are bit-identical (tested per-seed in tests/test_data.py).

Start method: ``forkserver`` by default (override with
CNSN_WORKER_START=fork|spawn).  Plain ``fork`` after the JAX backend
(and the axon tunnel's HTTP-relay threads) has initialized can
duplicate another thread's held lock into the child and deadlock it —
even though the workers only run numpy/PIL, fork copies the lock state
of *every* loaded threaded library.  Forkserver children descend from
a clean single-threaded server process, so pool creation time no
longer matters for safety; the pool is nevertheless created eagerly in
``__init__`` (loader-construction time) so startup cost lands before
the training loop, not inside its first step.
"""
from __future__ import annotations

import multiprocessing as mp
import os
from typing import Callable, Iterable, Iterator, Tuple

__all__ = ["PrefetchPool"]


class PrefetchPool:
    """Persistent worker pool mapping a per-item function over batches
    with one batch of work-ahead."""

    def __init__(self, num_workers: int, start_method: str = None):
        if num_workers <= 0:
            raise ValueError("PrefetchPool needs num_workers > 0")
        self.num_workers = num_workers
        self._start = (start_method
                       or os.environ.get("CNSN_WORKER_START", "forkserver"))
        # eager: workers exist before the first batch is requested
        self._pool = mp.get_context(self._start).Pool(self.num_workers)

    def _ensure(self):
        if self._pool is None:
            raise RuntimeError("PrefetchPool used after close()")
        return self._pool

    def run(self, fn: Callable, batches: Iterable[Tuple[list, object]]
            ) -> Iterator[Tuple[list, object]]:
        """``batches`` yields ``(items, meta)``; yields
        ``(results, meta)`` in order, with the next batch's work
        already dispatched before the current one is handed out."""
        pool = self._ensure()
        prev = None
        for items, meta in batches:
            chunk = max(1, len(items) // (4 * self.num_workers))
            fut = pool.map_async(fn, items, chunksize=chunk)
            if prev is not None:
                yield prev[0].get(), prev[1]
            prev = (fut, meta)
        if prev is not None:
            yield prev[0].get(), prev[1]

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # pragma: no cover - GC-order dependent
        try:
            self.close()
        except Exception:
            pass
