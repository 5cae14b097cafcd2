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
    channels and GSPMD inserts the psum; its output is replicated again;
  * ``conv3`` (1×1, planes→C_out) is **column-sharded** again, together
    with ``bn3`` and the downsample path (conv+bn), so the residual add
    and the post-add relu/CNSN site run channel-sharded and none of the
    block's convs is computed redundantly.  GSPMD re-replicates the
    activation (one all-gather over 'model') before the next block's
    contraction — an all-gather moves (1-1/n)·bytes vs the ~2·bytes of
    the psum the row-conv already pays, so sharding conv3 removes its
    redundant FLOPs for *less* communication than conv2 costs;
  * ``fc`` is column-sharded on classes (logits all-gather is tiny).

Everything else (stem, CNSN parameters) stays replicated, and the
batch stays sharded over 'data' — the same jitted step functions run
unchanged; GSPMD propagates the shardings and emits the ICI
collectives (all-reduce for gradients over 'data', psum/all-gather for
the sharded contractions over 'model').

``resnet_tp_rules_minimal`` keeps round 2's conv1/bn1/conv2-only
mapping for A/Bs (`scripts/tp_hlo_stats.py` compares compiled-HLO
collective counts and replicated-FLOP fractions of the two).
``dryrun_multichip`` runs the full mapping on an (n/2, 2) mesh.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DataParallel

__all__ = ["TensorParallel", "resnet_tp_rules", "resnet_tp_rules_minimal"]


def resnet_tp_rules(path: str, ndim: int) -> Optional[P]:
    """PartitionSpec for one ResNet param/stat leaf, by its tree path.

    ``path`` is '/'-joined (e.g. 'layer2_1/conv1/kernel'); returns None
    for replicated leaves.  Full-bottleneck mapping: every conv in the
    block (and the downsample shortcut) is sharded over 'model'.
    """
    # NB the dot-lowered 1x1 (Conv1x1Dot) deliberately keeps the 4-d
    # (1,1,Cin,Cout) kernel param, so one rule covers both lowerings.
    if re.search(r"layer\d+_\d+/(conv1|conv3|downsample_conv)/kernel$",
                 path) and ndim == 4:
        return P(None, None, None, "model")          # column-parallel
    if re.search(r"layer\d+_\d+/(bn1|bn3|downsample_bn)/"
                 r"(scale|bias|mean|var)$", path) and ndim == 1:
        return P("model")
    if re.search(r"layer\d+_\d+/conv2/kernel$", path) and ndim == 4:
        return P(None, None, "model", None)          # row-parallel
    if re.search(r"(^|/)fc/kernel$", path) and ndim == 2:
        return P(None, "model")                      # classes sharded
    if re.search(r"(^|/)fc/bias$", path) and ndim == 1:
        return P("model")
    return None


def resnet_tp_rules_minimal(path: str, ndim: int) -> Optional[P]:
    """Round 2's conv1/bn1/conv2-only mapping (conv3/downsample/fc
    replicated) — kept for collective-count A/Bs."""
    if re.search(r"layer\d+_\d+/conv1/kernel$", path) and ndim == 4:
        return P(None, None, None, "model")
    if re.search(r"layer\d+_\d+/bn1/(scale|bias|mean|var)$", path) and ndim == 1:
        return P("model")
    if re.search(r"layer\d+_\d+/conv2/kernel$", path) and ndim == 4:
        return P(None, None, "model", None)
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
        if spec is not None:
            # Rules don't know the mesh: drop any axis whose dim doesn't
            # divide the mesh axis size (e.g. fc sharded on classes with
            # num_classes=10 on a model=4 mesh would fail device_put;
            # replicating that dim is always correct — ADVICE r3).
            shape = getattr(leaf, "shape", ())

            def axis_size(ax):
                names = ax if isinstance(ax, (tuple, list)) else (ax,)
                n = 1
                for a in names:
                    n *= self.mesh.shape[a]
                return n

            spec = P(*(
                ax if (ax is None or (d < len(shape) and
                                      shape[d] % axis_size(ax) == 0))
                else None
                for d, ax in enumerate(spec)))
        return NamedSharding(self.mesh, spec if spec is not None else P())

    def shard_state(self, state):
        """Place a TrainState: params/batch_stats/opt_state leaves get
        their rule shardings (the optimizer momentum mirrors the param
        tree, so the same path rules apply); everything else replicates."""
        def place(path, leaf):
            return jax.device_put(leaf, self._leaf_sharding(path, leaf))
        return jax.tree_util.tree_map_with_path(place, state)

