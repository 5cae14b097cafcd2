"""Device-mesh data parallelism: the TPU-native replacement for
DataParallel / DDP+NCCL (reference: cifar.py:395, imagenet.py:533,
segmentation/tool/train_cnsn.py:95-122).

One jitted train step + sharding annotations; XLA inserts the gradient
all-reduce over ICI.  The CrossNorm pairing permutation is sampled
blockwise per shard (ops.crossnorm.grouped_permutation) so the gather
never crosses devices — matching the reference's per-GPU
``torch.randperm`` pairing semantics exactly.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "DataParallel"]


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first ``num_devices``.

    Default is 1-D over 'data'; pass ``shape`` (must multiply to the
    device count) for N-D meshes, e.g. ``make_mesh(8, ('data','model'),
    (4, 2))`` for the tensor-parallel seam (parallel/tensor.py)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(tuple(shape)), axis_names)


class DataParallel:
    """Sharding helpers around a mesh.

    Replicate the train state, shard batches on their batch axis, and
    call the (already jitted) step functions — GSPMD propagates the
    shardings and emits psum for the replicated-output gradients.
    """

    def __init__(self, mesh: Mesh, data_axis: str = "data",
                 spatial_axis: Optional[str] = None):
        self.mesh = mesh
        self.data_axis = data_axis
        # Optional spatial partitioning (SPMD "sp"): also shard the H
        # axis of (B, H, W, C) images / (B, H, W) labels over a second
        # mesh axis.  GSPMD inserts conv halo exchanges and widens the
        # BN/instance-stat reductions across the spatial shards, so the
        # math is identical to the unsharded step (tested:
        # tests/test_parallel.py::test_seg_spatial_partitioning).  This
        # is how resolutions that exceed one chip's HBM (e.g. the 713²
        # GTAV recipe at large batch) train without host-side tiling —
        # no reference counterpart (torch DataParallel only splits B).
        self.spatial_axis = spatial_axis
        self.replicated = NamedSharding(mesh, P())

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[self.data_axis]

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def shard_batch(self, array, axis: int = 0):
        """Shard one array along ``axis`` (0 for (B,...) batches, 1 for
        the (3, B, ...) stacked AugMix views).  With ``spatial_axis``
        set, spatial arrays (ndim ≥ 3) are additionally sharded along
        their H axis (``axis + 1``) — skipped (H replicated over the
        spatial axis) when H is not divisible by the spatial mesh
        width, e.g. the 8n+1 crop sizes seg recipes use (713) or
        odd-sized val images; GSPMD still reshards internally as the
        step's constraint shardings demand."""
        spec = [None] * array.ndim
        spec[axis] = self.data_axis
        if (self.spatial_axis is not None and array.ndim >= axis + 3
                and array.shape[axis + 1]
                    % self.mesh.shape[self.spatial_axis] == 0):
            spec[axis + 1] = self.spatial_axis
        return jax.device_put(array, NamedSharding(self.mesh, P(*spec)))

    def shard_inputs(self, images, labels):
        axis = 1 if images.ndim == 5 else 0
        return self.shard_batch(images, axis), self.shard_batch(labels, 0)
