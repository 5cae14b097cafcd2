"""Pallas TPU kernel: fully fused inference-mode SelfNorm.

Eval-mode SelfNorm (reference models/cnsn.py:130-150 with BatchNorm1d
in eval) is per-(sample, channel) local once the BN running stats are
folded into an affine:  g = sigmoid(a·(w0·μ + w1·σ) + b);  out = x·g.

XLA computes this as stats-pass + scale-pass (x read twice from HBM).
This kernel keeps the whole (HW, C) sample block in VMEM: one read,
one write — the SN bandwidth tax on inference drops ~33%.

Train mode needs a cross-batch BN reduction between stats and scale, so
it stays on the two-kernel path (ins_stats + jnp); the fused kernel is
used by eval/serving paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["selfnorm_infer_pallas", "selfnorm_infer_reference"]

_VMEM_BUDGET = 6 * 1024 * 1024  # per-sample block budget (bytes, fp32)


_BLOCK_C = 128  # one lane tile per grid step


def _sn_kernel(x_ref, w_ref, a_ref, b_ref, out_ref, *, hw, eps, ddof):
    x = x_ref[0].astype(jnp.float32)          # (HW, BLOCK_C)
    n = jnp.float32(hw)
    s1 = jnp.sum(x, axis=0)                   # (BLOCK_C,)
    s2 = jnp.sum(x * x, axis=0)
    mean = s1 / n
    var = s2 / n - mean * mean
    if ddof:
        var = var * (n / max(hw - ddof, 1))
    std = jnp.sqrt(var + eps)
    y = w_ref[0] * mean + w_ref[1] * std
    g = jax.nn.sigmoid(a_ref[0] * y + b_ref[0])
    out_ref[0] = (x * g[None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "ddof", "interpret"))
def selfnorm_infer_pallas(x: jax.Array, w: jax.Array, a: jax.Array,
                          b: jax.Array, eps: float = 1e-12, ddof: int = 1,
                          interpret: bool = False) -> jax.Array:
    """x: NHWC; w: (C, 2) g_fc weight; a, b: (C,) the folded BN-eval
    affine  a = scale/sqrt(rv+eps_bn),  b = bias − a·rm.

    Grid (N, C/128): each step keeps one (HW, 128) lane tile resident
    in VMEM — stats and scale in one HBM read + one write (XLA's fusion
    reads x twice), with the small grid steps giving Mosaic's revolving
    buffers room to overlap DMA with compute.  The (C, 2) weight is fed
    transposed so C rides the lane axis.
    """
    n, h, w_, c = x.shape
    hw = h * w_
    xr = x.reshape(n, hw, c)
    kernel = functools.partial(_sn_kernel, hw=hw, eps=eps, ddof=ddof)
    out = pl.pallas_call(
        kernel,
        grid=(n, pl.cdiv(c, _BLOCK_C)),
        in_specs=[
            pl.BlockSpec((1, hw, _BLOCK_C), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _BLOCK_C), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_C), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_C), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, _BLOCK_C), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(xr, w.T.astype(jnp.float32), a.reshape(1, c).astype(jnp.float32),
      b.reshape(1, c).astype(jnp.float32))
    return out.reshape(n, h, w_, c)


def selfnorm_fits_vmem(h: int, w: int, c: int) -> bool:
    # per-step footprint: (HW, 128) in + out, double-buffered
    return h * w * _BLOCK_C * 4 * 2 * 2 <= _VMEM_BUDGET * 2


def selfnorm_infer_reference(x, w, a, b, eps: float = 1e-12, ddof: int = 1):
    """jnp oracle with identical math (used in tests and as fallback)."""
    from ..stats import instance_mean_std
    n, _, _, c = x.shape
    mean, std = instance_mean_std(x.astype(jnp.float32), eps=eps, ddof=ddof)
    y = (w[:, 0] * mean.reshape(n, c) + w[:, 1] * std.reshape(n, c))
    g = jax.nn.sigmoid(a * y + b).reshape(n, 1, 1, c)
    return (x * g.astype(x.dtype))
