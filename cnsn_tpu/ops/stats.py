"""Per-instance (per-sample, per-channel) spatial statistics.

TPU-native equivalents of the reference's instance-statistics math
(reference: models/cnsn.py:8-17 ``calc_ins_mean_std``).  All arrays are
NHWC (channels-last), the natural TPU layout: the channel axis maps onto
the 128-wide lane dimension, so per-(N, C) reductions over H*W vectorize
cleanly on the VPU and XLA fuses the surrounding elementwise chains.

Parity notes (checked by tests against torch oracles):
  * variance is **unbiased** (ddof=1, Bessel correction) — the PyTorch
    ``Tensor.var`` default used by the reference;
  * ``eps`` is added to the *variance* before the square root;
  * statistics are computed in float32 even for bf16 inputs.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# 'one' (default) = single-pass E[x²]−E[x]² in fp32: instance stats
# reduce over H·W only (small n) and the CNSN sites sit on BN'd
# activations (mean² ≲ var), so cancellation is benign — the golden
# full-model parity suite passes with this setting (tests/test_golden).
# 'two' = centered two-pass (torch's reduction order) kept for A/B;
# BatchNorm (N·H·W reductions, mean²≫var post-ReLU) is where one-pass
# actually diverges and uses the shifted form instead (nn/norm.py).
_VAR_IMPL = os.environ.get("CNSN_STATS_VAR", "one")
# Streaming Pallas instance-stats kernel (ops/pallas/ins_stats.py
# ins_stats_v2 + analytic VJP) for lane-aligned channels: one
# full-bandwidth plane read per (sample, channel-block).  Off until
# measured on chip.  Env: CNSN_INS_PALLAS.
_INS_PALLAS = os.environ.get("CNSN_INS_PALLAS", "0") == "1"

__all__ = [
    "instance_mean_std",
    "masked_instance_mean_std",
    "region_mask",
]


def instance_mean_std(x: jax.Array, eps: float = 1e-5, ddof: int = 1,
                      out_dtype=None):
    """Spatial mean/std per (sample, channel) of an NHWC tensor.

    Returns ``(mean, std)`` each shaped (N, 1, 1, C) for direct
    broadcasting against ``x``.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    if _INS_PALLAS:
        from .pallas import pallas_dispatch
        from .pallas.ins_stats import ins_stats_diff, ins_stats_v2_fits
        use, interp = pallas_dispatch()
        if (use and ins_stats_v2_fits(x.shape[1], x.shape[2], x.shape[3],
                                      x.dtype.itemsize)):
            m, s = ins_stats_diff(x, eps, ddof, interp)
            shape = (x.shape[0], 1, 1, x.shape[3])
            dt = out_dtype or x.dtype
            return m.reshape(shape).astype(dt), s.reshape(shape).astype(dt)
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    n = x.shape[1] * x.shape[2]
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    if _VAR_IMPL == "one":
        var = (jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
               - jnp.square(mean))
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    if ddof:
        var = var * (n / max(n - ddof, 1))
    std = jnp.sqrt(var + eps)
    dt = out_dtype or x.dtype
    return mean.astype(dt), std.astype(dt)


def region_mask(h: int, w: int, h1, h2, w1, w2, dtype=jnp.float32) -> jax.Array:
    """(1, H, W, 1) mask that is 1 inside rows [h1, h2) and cols [w1, w2).

    Bounds may be traced scalars — the mask is built from iota
    comparisons, so the shape stays static under jit (the TPU-friendly
    replacement for the reference's dynamic slicing at
    models/cnsn.py:66,77).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    inside = (rows >= h1) & (rows < h2) & (cols >= w1) & (cols < w2)
    return inside.astype(dtype)


def masked_instance_mean_std(
    x: jax.Array,
    mask: jax.Array,
    eps: float = 1e-5,
    ddof: int = 1,
    out_dtype=None,
):
    """Mean/std per (N, C) over the spatial positions where ``mask`` is 1.

    ``mask`` broadcasts against (N, H, W, 1).  Mathematically identical
    to cropping ``x`` to the masked region and calling
    :func:`instance_mean_std` — but with static shapes, which is what
    lets the whole CrossNorm train step stay inside one XLA program
    (reference computes stats of a dynamic crop at models/cnsn.py:64-66).
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    m = jnp.broadcast_to(mask.astype(jnp.float32), (x.shape[0], x.shape[1], x.shape[2], 1))
    n = jnp.sum(m, axis=(1, 2), keepdims=True)
    s1 = jnp.sum(xf * m, axis=(1, 2), keepdims=True)
    mean = s1 / n
    if _VAR_IMPL == "one":
        s2 = jnp.sum(jnp.square(xf) * m, axis=(1, 2), keepdims=True)
        var = s2 / n - jnp.square(mean)
    else:
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 2),
                      keepdims=True) / n
    if ddof:
        denom = jnp.maximum(n - ddof, 1.0)
        var = var * (n / denom)
    std = jnp.sqrt(var + eps)
    dt = out_dtype or x.dtype
    return mean.astype(dt), std.astype(dt)
