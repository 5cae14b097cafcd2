"""Pipeline parallelism (GPipe schedule) over a 'stage' mesh axis.

The reference has no pipeline story at all — it replicates the whole
model per GPU (cifar.py:395, imagenet.py:533,
segmentation/tool/train_cnsn.py:95-122), so nothing deeper than one
device's memory can train.  A production TPU framework needs the
model-depth scaling axis too: split a homogeneous block stack into S
stages, park each stage's parameters on its own mesh slice, and stream
microbatches through the ring.

TPU-native design (NOT a torch.distributed.pipeline translation):

* One ``shard_map`` over the ``stage`` mesh axis; each device holds the
  parameters of its ``L/S`` layers (leading layer dim sharded with
  ``P('stage')`` — zero per-device memory overhead for other stages).
* The schedule is a single ``lax.scan`` over ``M + S - 1`` ticks; at
  every tick each device runs its stage on the activation in flight and
  ``lax.ppermute`` shifts the ring forward one hop over ICI.  That is
  the collective-pipelining recipe (scaling-book §pipelining): no
  host-side scheduler threads, no per-microbatch dispatch — the whole
  pipeline is one compiled XLA program, bubble fraction (S-1)/(M+S-1).
* Backward needs no hand-written 1F1B: ``jax.grad`` differentiates the
  scan, and the transpose of ``ppermute`` is the reverse ring — XLA
  schedules the backward pipeline automatically.
* Composes with data parallelism on a 2-D ``(data, stage)`` mesh: the
  microbatch axis shards over 'data' while layers shard over 'stage'
  (exercised by ``__graft_entry__.dryrun_multichip``).

Normalization caveat (honest, documented): a GPipe schedule cannot
update *batch-coupled* running statistics consistently mid-flight
(microbatches traverse a stage at different optimizer phases), which is
why pipelined stacks here use the instance-statistic SelfNorm gate
(``selfnorm_block``) — per-sample statistics are microbatch-invariant,
so pipelined math is *exactly* the sequential math (tested to f32
equality in tests/test_pipeline.py).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.stats import instance_mean_std

__all__ = ["pipeline_apply", "pipeline_stages", "stack_layer_params",
           "PipelineParallel", "selfnorm_block", "init_selfnorm_block"]


def _ring_schedule(run_stage, xs_local, *, stage_axis: str, S: int, M: int,
                   mb_shape, dtype, data_axis=None):
    """The GPipe tick loop shared by ``pipeline_apply`` (homogeneous
    layer stacks) and ``pipeline_stages`` (heterogeneous stage
    functions): one ``lax.scan`` over ``M + S - 1`` ticks, stage 0
    ingesting microbatches from ``xs_local``, ``lax.ppermute`` shifting
    the ring one hop per tick, the last stage draining outputs.
    ``run_stage(h)`` must preserve ``mb_shape`` (heterogeneous callers
    pad their flattened activations to one max width)."""
    stage = jax.lax.axis_index(stage_axis)

    def tick(carry, t):
        state, outs = carry
        # stage 0 ingests microbatch t (clamped reads past M-1 are
        # in-flight garbage that provably never reaches `outs`:
        # they would land on the last stage after the loop ends)
        feed = jax.lax.dynamic_index_in_dim(
            xs_local, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        inp = jnp.where(stage == 0, feed, state)
        y = run_stage(inp)
        # last stage emits microbatch t-(S-1) once the fill ends
        idx = jnp.clip(t - (S - 1), 0, M - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
        take = jnp.logical_and(t >= S - 1, stage == S - 1)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(take, y, cur), idx, 0)
        state = jax.lax.ppermute(
            y, stage_axis, [(i, (i + 1) % S) for i in range(S)])
        return (state, outs), None

    # the carry becomes stage-varying after the first ppermute (and
    # data-varying when microbatches are data-sharded), so its
    # initial value must be cast varying for the vma checker
    vma = (stage_axis,) + ((data_axis,) if data_axis else ())
    carry0 = jax.lax.pcast(
        (jnp.zeros(mb_shape, dtype),
         jnp.zeros((M,) + mb_shape, dtype)),
        vma, to="varying")
    (_, outs), _ = jax.lax.scan(tick, carry0, jnp.arange(M + S - 1))
    return outs


def stack_layer_params(trees):
    """Stack a list of per-layer param trees into one tree with a
    leading layer dim (the dim ``PipelineParallel`` shards over
    'stage' and ``pipeline_apply`` scans over)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def pipeline_apply(block_fn: Callable[[Any, jax.Array], jax.Array],
                   stacked_params: Any,
                   x: jax.Array,
                   mesh: Mesh,
                   num_microbatches: int,
                   stage_axis: str = "stage",
                   data_axis: Optional[str] = None) -> jax.Array:
    """Apply ``L`` stacked homogeneous layers to ``x`` on a pipeline.

    ``block_fn(params_l, h) -> h`` must be shape- and dtype-preserving
    (a residual block).  ``stacked_params`` leaves carry a leading
    layer dim ``L`` with ``L % S == 0`` (``S`` = mesh['stage'] size);
    each device scans its local ``L/S`` layers per tick.  ``x`` is
    ``(B, ...)`` with ``B % num_microbatches == 0``; with ``data_axis``
    set, microbatches are additionally sharded over that mesh axis
    (batch-local math only — instance stats qualify, batch stats do
    not).  Differentiable end to end (``ppermute`` transposes to the
    reverse ring).
    """
    S = mesh.shape[stage_axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"L={L} layers must divide over {S} stages")
    M = num_microbatches
    B = x.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    if data_axis is not None:
        d = mesh.shape[data_axis]
        if (B // M) % d != 0:
            raise ValueError(
                f"microbatch size {B // M} (batch {B} / {M} microbatches) "
                f"not divisible by mesh axis '{data_axis}' of size {d}")
    xs = x.reshape((M, B // M) + x.shape[1:])

    def per_stage(params_local, xs_local):
        def run_stage(h):
            h, _ = jax.lax.scan(lambda c, p: (block_fn(p, c), None),
                                h, params_local)
            return h

        return _ring_schedule(run_stage, xs_local, stage_axis=stage_axis,
                              S=S, M=M, mb_shape=xs_local.shape[1:],
                              dtype=x.dtype, data_axis=data_axis)

    batch_spec = (data_axis,) if data_axis else (None,)
    xs_spec = P(None, *batch_spec)
    out_spec = P(stage_axis, *batch_spec)
    param_specs = jax.tree.map(lambda _: P(stage_axis), stacked_params)
    out = jax.shard_map(per_stage, mesh=mesh,
                        in_specs=(param_specs, xs_spec),
                        out_specs=out_spec)(stacked_params, xs)
    # every stage contributes an (M, mb, ...) block along dim 0; only
    # the last stage's block holds drained microbatches — the slice is
    # lazy under jit (no collective: it reads last-stage shards only)
    return out[(S - 1) * M:].reshape((B,) + x.shape[1:])


def pipeline_stages(stage_fns, params, x: jax.Array, mesh: Mesh,
                    num_microbatches: int, stage_axis: str = "stage",
                    data_axis: Optional[str] = None) -> jax.Array:
    """GPipe over *heterogeneous* stages — the real-model pipeline.

    ``stage_fns[s](params, h) -> h_next`` are S arbitrary stage
    functions (e.g. ``models.resnet.ResNetStage.apply`` closures over
    bottleneck ranges); activation shapes may differ per stage — each
    hop's payload is the activation flattened per sample and padded to
    the widest stage boundary, so the ring carry stays one static
    shape.  ``params`` is passed replicated to every device (with
    heterogeneous stages the per-stage trees have different structures,
    so they cannot shard over 'stage' the way ``pipeline_apply``'s
    stacked homogeneous layers do; stage selection is a
    ``lax.switch`` on the device's stage index).  For eval/serving
    forwards — frozen BN, inactive CrossNorm, per-sample SelfNorm —
    every stage is microbatch-invariant, so the pipelined result
    equals the sequential forward exactly (tests/test_pipeline.py).

    Replaces the reference's whole-model-per-device replication
    (imagenet.py:533) with depth-sharded *execution*; parameter
    placement stays replicated in this heterogeneous formulation
    (documented limitation — the homogeneous ``pipeline_apply`` shards
    parameters too).
    """
    S = mesh.shape[stage_axis]
    if len(stage_fns) != S:
        raise ValueError(f"{len(stage_fns)} stage fns on {S} stages")
    M = num_microbatches
    B = x.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    if data_axis is not None:
        d = mesh.shape[data_axis]
        if (B // M) % d != 0:
            raise ValueError(
                f"microbatch size {B // M} (batch {B} / {M} microbatches) "
                f"not divisible by mesh axis '{data_axis}' of size {d}")
    mb = B // M

    # chain the per-stage activation shapes (batch-leading; per-sample
    # element counts are batch-invariant, so tracing at the global
    # microbatch size also covers the data-sharded local size)
    in_structs = []
    cur = jax.ShapeDtypeStruct((mb,) + x.shape[1:], x.dtype)
    for f in stage_fns:
        in_structs.append(cur)
        cur = jax.eval_shape(f, params, cur)
    out_struct = cur
    elems = [math.prod(s.shape[1:]) for s in in_structs + [out_struct]]
    maxe = max(elems)
    if out_struct.dtype != x.dtype:
        raise ValueError(f"stage dtypes must match input: "
                         f"{out_struct.dtype} vs {x.dtype}")

    xs = x.reshape(M, mb, elems[0])
    xs = jnp.pad(xs, ((0, 0), (0, 0), (0, maxe - elems[0])))

    def per_stage(params_rep, xs_local):
        stage = jax.lax.axis_index(stage_axis)
        mbl = xs_local.shape[1]

        def make_branch(s, f):
            def branch(buf):
                shp = in_structs[s].shape[1:]
                h = buf[:, :elems[s]].reshape((mbl,) + shp)
                y = f(params_rep, h).reshape(mbl, -1)
                return jnp.pad(y, ((0, 0), (0, maxe - y.shape[1])))
            return branch

        branches = [make_branch(s, f) for s, f in enumerate(stage_fns)]

        def run_stage(buf):
            return jax.lax.switch(stage, branches, buf)

        return _ring_schedule(run_stage, xs_local, stage_axis=stage_axis,
                              S=S, M=M, mb_shape=(mbl, maxe),
                              dtype=x.dtype, data_axis=data_axis)

    batch_spec = (data_axis,) if data_axis else (None,)
    param_specs = jax.tree.map(lambda _: P(), params)
    out = jax.shard_map(per_stage, mesh=mesh,
                        in_specs=(param_specs, P(None, *batch_spec, None)),
                        out_specs=P(stage_axis, *batch_spec, None))(
                            params, xs)
    # only the last stage's (M, mb, maxe) block holds drained outputs
    out = out[(S - 1) * M:].reshape(B, maxe)[:, :elems[-1]]
    return out.reshape((B,) + out_struct.shape[1:])


def resnet_stage_fns(model, num_stages: int):
    """Split a ``models.resnet.ResNet`` into ``num_stages`` contiguous
    bottleneck ranges (stem rides stage 0, pool+fc the last) balanced
    by block count, returning ``pipeline_stages``-shaped closures.
    Eval forward only — the serving path (serving.py exports)."""
    from ..models.resnet import ResNet, ResNetStage, block_plan
    if not isinstance(model, ResNet):
        raise ValueError(
            f"pipelined serving stages are implemented for models.resnet."
            f"ResNet (got {type(model).__name__}); export the plain "
            f"artifact for other families")
    n = len(block_plan(model.layers))
    if num_stages < 1 or num_stages > n:
        raise ValueError(f"num_stages={num_stages} for {n} blocks")
    bounds = [round(i * n / num_stages) for i in range(num_stages + 1)]
    fns = []
    for s in range(num_stages):
        stage = ResNetStage.from_model(model, bounds[s], bounds[s + 1])
        fns.append(lambda v, h, m=stage: m.apply(v, h))
    return fns


def selfnorm_block(params, x: jax.Array) -> jax.Array:
    """Homogeneous pipelined stage unit: 3x3 conv -> SelfNorm-style
    instance-stat gate -> ReLU, residual.

    The gate is the reference's SelfNorm attention
    (models/cnsn.py:113-150: per-channel FC over (mean, std) ->
    sigmoid -> scale) with the gate-path BatchNorm1d omitted — batch
    statistics are cross-microbatch state a pipeline schedule cannot
    accumulate consistently (module docstring), and instance statistics
    are the part that makes SelfNorm SelfNorm.
    """
    h = jax.lax.conv_general_dilated(
        x, params["conv"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mean, std = instance_mean_std(h, eps=1e-12)       # (N,1,1,C) each
    n, c = h.shape[0], h.shape[-1]
    stats = jnp.stack([mean.reshape(n, c), std.reshape(n, c)], -1)
    sdt = jnp.promote_types(h.dtype, jnp.float32)
    gate = jax.nn.sigmoid(
        jnp.einsum("nck,ck->nc", stats.astype(sdt), params["g_fc"]))
    h = h * gate.reshape(n, 1, 1, c).astype(h.dtype)
    return x + jax.nn.relu(h)


def init_selfnorm_block(key, channels: int):
    """One ``selfnorm_block`` param tree (he-normal conv; the SelfNorm
    FC uses the same U(±sqrt(1/2)) init as nn.cnsn._conv1d_k2_init)."""
    k1, k2 = jax.random.split(key)
    fan_in = 3 * 3 * channels
    conv = (jax.random.normal(k1, (3, 3, channels, channels), jnp.float32)
            * jnp.sqrt(2.0 / fan_in))
    bound = (1.0 / 2.0) ** 0.5
    g_fc = jax.random.uniform(k2, (channels, 2), jnp.float32,
                              -bound, bound)
    return {"conv": conv, "g_fc": g_fc}


class PipelineParallel:
    """Placement helpers for a pipeline (optionally x data) mesh.

    ``shard_blocks`` parks each stage's layer slices on its mesh slice
    (leading layer dim over 'stage'); everything else replicates.
    """

    def __init__(self, mesh: Mesh, stage_axis: str = "stage",
                 data_axis: Optional[str] = None):
        self.mesh = mesh
        self.stage_axis = stage_axis
        self.data_axis = data_axis

    @property
    def num_stages(self) -> int:
        return self.mesh.shape[self.stage_axis]

    def shard_blocks(self, stacked_params):
        sh = NamedSharding(self.mesh, P(self.stage_axis))
        return jax.tree.map(lambda p: jax.device_put(p, sh),
                            stacked_params)

    def replicate(self, tree):
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def shard_batch(self, array, axis: int = 0):
        spec = [None] * array.ndim
        if self.data_axis is not None:
            spec[axis] = self.data_axis
        return jax.device_put(array,
                              NamedSharding(self.mesh, P(*spec)))
