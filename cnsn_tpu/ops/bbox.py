"""Rejection-sampled bounding boxes for CrossNorm cropping, under jit.

Reimplements the sampling *distribution* of the reference's host-side
rejection loop (reference: models/cnsn.py:32-55 ``cn_rand_bbox``) as a
``lax.while_loop`` over scalars, so it compiles into the train step with
no host sync:

  * area ratio ~ Beta(beta, beta); side fraction = sqrt(ratio);
  * cut sizes truncate to int (``int(dim * frac)``);
  * center uniform over the full extent; box clipped to bounds;
  * resample until the realized (clipped) area ratio > ``bbx_thres``.

Axis naming: the reference labels torch dim2 "W" and dim3 "H" (swapped
but self-consistent).  Here boxes are sampled per spatial axis of an
NHWC tensor — (h1, h2) over axis 1 and (w1, w2) over axis 2 — which is
the same joint distribution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_bbox"]


def _propose(key: jax.Array, h: int, w: int, beta: float):
    k_ratio, k_ch, k_cw = jax.random.split(key, 3)
    ratio = jax.random.beta(k_ratio, beta, beta)
    frac = jnp.sqrt(ratio)
    cut_h = (h * frac).astype(jnp.int32)  # truncation, like int()
    cut_w = (w * frac).astype(jnp.int32)
    ch = jax.random.randint(k_ch, (), 0, h)
    cw = jax.random.randint(k_cw, (), 0, w)
    h1 = jnp.clip(ch - cut_h // 2, 0, h)
    h2 = jnp.clip(ch + cut_h // 2, 0, h)
    w1 = jnp.clip(cw - cut_w // 2, 0, w)
    w2 = jnp.clip(cw + cut_w // 2, 0, w)
    return h1, h2, w1, w2


def sample_bbox(key: jax.Array, h: int, w: int, beta: float = 1.0,
                bbx_thres: float = 0.1):
    """Sample one (h1, h2, w1, w2) box shared by the whole batch.

    Returns int32 scalars usable as traced bounds for
    :func:`cnsn_tpu.ops.stats.region_mask`.
    """

    def cond(state):
        _, (h1, h2, w1, w2) = state
        area = ((h2 - h1) * (w2 - w1)).astype(jnp.float32) / float(h * w)
        return area <= bbx_thres

    def body(state):
        key, _ = state
        key, sub = jax.random.split(key)
        return key, _propose(sub, h, w, beta)

    key, sub = jax.random.split(key)
    init = (key, _propose(sub, h, w, beta))
    _, box = jax.lax.while_loop(cond, body, init)
    return box
