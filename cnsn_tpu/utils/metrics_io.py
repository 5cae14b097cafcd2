"""Structured metric logging: JSONL scalars + optional TensorBoard mirror.

Replaces the reference's tensorboardX writer
(segmentation/tool/train_cnsn.py:165,372-376) and tab-separated log.txt
with a dependency-free JSONL stream; ``tensorboard=True`` additionally
mirrors every scalar into TB event files (via torch's SummaryWriter,
guarded import) so the reference's `tensorboard --logdir` workflow
keeps working unchanged.
"""
from __future__ import annotations

import json
import os
import time

__all__ = ["MetricWriter"]


class MetricWriter:
    def __init__(self, log_dir: str, tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except ImportError:  # keep JSONL-only on minimal images
                pass

    def scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step),
                                  "wall_time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._f.close()
