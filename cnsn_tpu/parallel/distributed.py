"""Multi-host initialization and per-process data slicing.

The reference's multi-process story is mp.spawn + NCCL process groups +
DistributedSampler (segmentation/tool/train_cnsn.py:95-122).  The
TPU-native equivalent: ``jax.distributed.initialize`` joins the hosts
into one runtime, the same jitted program runs on every host, and each
host feeds only the batch rows for its addressable devices (XLA moves
nothing — ``make_array_from_process_local_data`` assembles the global
array view).  Collectives ride ICI within a slice and DCN across
slices, inserted by GSPMD.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "process_batch_slice", "global_batch_array"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime (no-op for single-process runs).

    On Cloud TPU the arguments are discovered from the metadata server;
    pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def process_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's rows in the global batch — the
    DistributedSampler replacement."""
    n, i = jax.process_count(), jax.process_index()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"process count {n}")
    per = global_batch // n
    return i * per, per


def global_batch_array(mesh: Mesh, local_rows: np.ndarray,
                       axis: str = "data"):
    """Assemble a globally-sharded array from this host's local rows."""
    spec = [None] * local_rows.ndim
    spec[0] = axis
    sharding = NamedSharding(mesh, P(*spec))
    return jax.make_array_from_process_local_data(sharding, local_rows)
