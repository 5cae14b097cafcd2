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

    def __init__(self, mesh: Mesh, data_axis: str = "data"):
        self.mesh = mesh
        self.data_axis = data_axis
        self.replicated = NamedSharding(mesh, P())

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[self.data_axis]

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def shard_batch(self, array, axis: int = 0):
        """Shard one array along ``axis`` (0 for (B,...) batches, 1 for
        the (3, B, ...) stacked AugMix views)."""
        spec = [None] * array.ndim
        spec[axis] = self.data_axis
        return jax.device_put(array, NamedSharding(self.mesh, P(*spec)))

    def shard_inputs(self, images, labels):
        axis = 1 if images.ndim == 5 else 0
        return self.shard_batch(images, axis), self.shard_batch(labels, 0)
