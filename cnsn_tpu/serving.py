"""Serving: portable AOT artifacts for eval forwards.

The reference has no deployment story — its eval loops live inside the
training drivers (cifar.py:280-312, imagenet.py:380-450) and need the
full torch model code to run.  The TPU-native story: export the eval
forward ONCE as StableHLO with a *symbolic batch dimension*
(`jax.export`), weights baked in as constants, serialized to a single
file.  Deserializing needs no model Python at all — the artifact
compiles for whatever platform serves it (TPU serving runtimes consume
StableHLO directly), and one artifact serves every batch size.

Usage:
    exported = export_classifier(model, variables, image_size=224)
    save_artifact(exported, "resnet50_cnsn.shlo")
    ...
    serve = load_artifact("resnet50_cnsn.shlo")   # no cnsn_tpu needed
    logits = serve(images)                         # any batch size
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_classifier", "export_pipelined_classifier",
           "export_segmenter", "save_artifact", "load_artifact"]


def _export(fwd: Callable, spec: jax.ShapeDtypeStruct,
            platforms: Optional[Sequence[str]]):
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(fwd), **kw)(spec)


def export_classifier(model, variables, image_size: int,
                      dtype: Any = jnp.float32,
                      batch: Optional[int] = None,
                      platforms: Optional[Sequence[str]] = None):
    """Export a classification model's eval forward (images → logits).

    ``batch=None`` exports a symbolic batch dim ``b`` — one artifact
    serves every batch size.  ``platforms`` defaults to the current
    backend; pass e.g. ``('tpu', 'cpu')`` for a multi-platform artifact.
    Weights (params + BN running stats) are closed over and baked into
    the artifact as constants.
    """
    def fwd(images):
        return model.apply(variables, images, False, None)

    b = jexport.symbolic_shape("b")[0] if batch is None else batch
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), dtype)
    return _export(fwd, spec, platforms)


def export_pipelined_classifier(model, variables, image_size: int,
                                num_stages: int,
                                num_microbatches: Optional[int] = None,
                                batch: int = 8,
                                dtype: Any = jnp.float32,
                                platforms: Optional[Sequence[str]] = None):
    """Export the eval forward GPipe'd over a ``num_stages`` 'stage'
    mesh (parallel/pipeline.py::pipeline_stages): bottleneck ranges
    execute on their own mesh slices while microbatches stream through
    the ppermute ring — depth-sharded serving instead of the
    reference's whole-model-per-device replication (imagenet.py:533).

    BN frozen + CrossNorm inactive + per-sample SelfNorm make every
    stage microbatch-invariant, so the artifact's outputs equal the
    unpipelined export exactly (tests/test_serving.py).  The batch is
    fixed (the schedule reshapes into microbatches); serving the
    artifact needs ``num_stages`` devices — call it under a jit whose
    shardings supply the serving mesh, e.g.::

        serve = load_artifact(path)
        mesh = jax.sharding.Mesh(jax.devices()[:S], ("stage",))
        logits = jax.jit(serve, in_shardings=NamedSharding(mesh, P()))(x)
    """
    from .parallel import pipeline_stages, resnet_stage_fns
    from .parallel.mesh import make_mesh

    M = num_microbatches or num_stages
    if batch % M != 0:
        raise ValueError(f"batch {batch} not divisible by {M} microbatches")
    mesh = make_mesh(num_stages, ("stage",))
    fns = resnet_stage_fns(model, num_stages)

    def fwd(images):
        return pipeline_stages(fns, variables, images, mesh, M)

    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), dtype)
    return _export(fwd, spec, platforms)


def export_segmenter(model, variables, hw,
                     dtype: Any = jnp.float32,
                     batch: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None):
    """Export a segmentation model's eval forward (images → per-pixel
    class logits at input resolution, main head only — the reference's
    eval contract, segmentation/model/fcn.py:120-126)."""
    def fwd(images):
        return model.apply(variables, images, False, None, None)[0]

    b = jexport.symbolic_shape("b")[0] if batch is None else batch
    spec = jax.ShapeDtypeStruct((b, hw[0], hw[1], 3), dtype)
    return _export(fwd, spec, platforms)


def save_artifact(exported, path: str) -> None:
    """Serialize an Exported to one file."""
    with open(path, "wb") as f:
        f.write(bytes(exported.serialize()))


def load_artifact(path: str) -> Callable:
    """Deserialize an artifact into a callable — no model code needed.

    The returned callable jit-compiles per concrete input shape on
    first use (symbolic-batch artifacts refine to the shape served).
    """
    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return jax.jit(exported.call)
