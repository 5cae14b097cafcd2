"""Optional 2-D (data × model) mesh parallelism.

The reference needs only data parallelism (CNNs ≤ 26M params —
SURVEY §2.8), but the framework's mesh abstraction is the seam where
tensor parallelism attaches.  This module exercises that seam for the
ResNet family with the Megatron column/row pattern mapped onto the
bottleneck:

  * ``conv1`` (1×1, C_in→planes) is **column-sharded**: kernel
    P(..., 'model'), so its activation is sharded on channels;
  * ``bn1`` parameters/stats follow P('model') — BatchNorm reduces over
    (N, H, W) only, so per-channel statistics shard cleanly with zero
    extra communication;
  * ``conv2`` (3×3, planes→planes) is **row-sharded** on C_in:
    kernel P(None, None, 'model', None) contracts over the sharded
    channels and GSPMD inserts the psum; its output is replicated again.

Everything else (conv3, downsample, fc, CNSN sites) stays replicated,
and the batch stays sharded over 'data' — the same jitted step
functions run unchanged; GSPMD propagates the shardings and emits the
ICI collectives (all-reduce for gradients over 'data', psum for the
row-sharded contractions over 'model').

This is deliberately the *functional* TP mapping, not a tuned one: it
demonstrates that the whole train step (CrossNorm gather, SelfNorm
BN1d, optimizer) composes with a 2-D mesh.  ``dryrun_multichip`` runs
it on an (n/2, 2) mesh.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DataParallel

__all__ = ["TensorParallel", "resnet_tp_rules"]


def resnet_tp_rules(path: str, ndim: int) -> Optional[P]:
    """PartitionSpec for one ResNet param/stat leaf, by its tree path.

    ``path`` is '/'-joined (e.g. 'layer2_1/conv1/kernel'); returns None
    for replicated leaves.
    """
    # NB the dot-lowered 1x1 (Conv1x1Dot) deliberately keeps the 4-d
    # (1,1,Cin,Cout) kernel param, so one rule covers both lowerings.
    if re.search(r"layer\d+_\d+/conv1/kernel$", path) and ndim == 4:
        return P(None, None, None, "model")          # column-parallel
    if re.search(r"layer\d+_\d+/bn1/(scale|bias|mean|var)$", path) and ndim == 1:
        return P("model")
    if re.search(r"layer\d+_\d+/conv2/kernel$", path) and ndim == 4:
        return P(None, None, "model", None)          # row-parallel
    return None


class TensorParallel(DataParallel):
    """Sharding helpers for a ('data', 'model') mesh.

    Extends the DataParallel flow (batch sharding is inherited): the
    state is placed with per-leaf param shardings from ``rules``
    instead of full replication.
    """

    def __init__(self, mesh: Mesh, rules=resnet_tp_rules,
                 data_axis: str = "data", model_axis: str = "model"):
        assert model_axis in mesh.axis_names, mesh.axis_names
        super().__init__(mesh, data_axis=data_axis)
        self.rules = rules
        self.model_axis = model_axis

    def _leaf_sharding(self, path_parts, leaf) -> NamedSharding:
        def part(p):
            for a in ("key", "name", "idx"):
                if hasattr(p, a):
                    return str(getattr(p, a))
            return str(p)
        path = "/".join(part(p) for p in path_parts)
        spec = self.rules(path, getattr(leaf, "ndim", 0))
        return NamedSharding(self.mesh, spec if spec is not None else P())

    def shard_state(self, state):
        """Place a TrainState: params/batch_stats/opt_state leaves get
        their rule shardings (the optimizer momentum mirrors the param
        tree, so the same path rules apply); everything else replicates."""
        def place(path, leaf):
            return jax.device_put(leaf, self._leaf_sharding(path, leaf))
        return jax.tree_util.tree_map_with_path(place, state)

