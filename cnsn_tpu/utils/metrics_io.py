"""Structured metric logging: JSONL scalars + optional CSV export.

Replaces the reference's tensorboardX writer
(segmentation/tool/train_cnsn.py:165,372-376) and tab-separated log.txt
with a dependency-free JSONL stream that tensorboard-compatible tooling
can ingest offline.
"""
from __future__ import annotations

import json
import os
import time

__all__ = ["MetricWriter"]


class MetricWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self.path, "a", buffering=1)

    def scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step),
                                  "wall_time": time.time()}) + "\n")

    def close(self):
        self._f.close()
