"""Profiling utilities: jax.profiler trace capture + step timing.

The reference's only timing instrumentation was wall-clock
AverageMeters printed per print_freq (imagenet.py:146-156); here that
becomes a StepTimer plus an opt-in XLA trace context usable with
Perfetto/TensorBoard tooling.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

from .meters import AverageMeter

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture an XLA profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """data-time / batch-time meters (imagenet.py:146-188 pattern)."""

    def __init__(self):
        self.data_time = AverageMeter()
        self.batch_time = AverageMeter()
        self._end = time.time()

    def data_loaded(self):
        self.data_time.update(time.time() - self._end)

    def step_done(self):
        now = time.time()
        self.batch_time.update(now - self._end)
        self._end = now

    def summary(self) -> str:
        return (f"Data {self.data_time.val:.3f} ({self.data_time.avg:.3f}) "
                f"Batch {self.batch_time.val:.3f} "
                f"({self.batch_time.avg:.3f})")
