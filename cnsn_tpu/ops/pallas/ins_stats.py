"""Pallas TPU kernel: fused per-(sample, channel) spatial mean/std.

One VMEM pass over the activation computes sum and sum-of-squares per
channel lane (C rides the 128-lane axis), finalizing mean and
std = sqrt(var·HW/(HW−ddof) + eps) — the reference's unbiased instance
statistics (models/cnsn.py:8-17) without materializing intermediates.

Grid: (N, ceil(HW / CHUNK)); fp32 accumulators live in VMEM scratch and
are folded into the (N, C) outputs on the last chunk.  Falls back to
the jnp implementation (ops.stats.instance_mean_std) for shapes where
the kernel offers nothing; the jnp path is also the correctness oracle
in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stats import instance_mean_std as _jnp_stats

__all__ = ["ins_stats_pallas", "instance_mean_std_fast"]


def _pick_chunk(hw: int, c: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    rows = max(budget_bytes // (4 * max(c, 1)), 8)
    rows = min(rows, hw)
    # sublane multiple
    return max((rows // 8) * 8, 8)


def _stats_kernel(x_ref, mean_ref, std_ref, acc_ref, *, hw, chunk, eps, ddof):
    k = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (chunk, C)
    base = k * chunk
    remaining = hw - base
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # select (not multiply): padded out-of-bounds VMEM rows are
    # unspecified, and NaN * 0.0 would poison the accumulator
    xv = jnp.where(rows < remaining, x, 0.0)
    acc_ref[0] += jnp.sum(xv, axis=0)
    acc_ref[1] += jnp.sum(xv * xv, axis=0)

    @pl.when(k == num_k - 1)
    def _():
        n = jnp.float32(hw)
        mean = acc_ref[0] / n
        var = acc_ref[1] / n - mean * mean
        if ddof:
            var = var * (n / max(hw - ddof, 1))
        mean_ref[0, 0] = mean
        std_ref[0, 0] = jnp.sqrt(var + eps)


@functools.partial(jax.jit, static_argnames=("eps", "ddof", "interpret"))
def ins_stats_pallas(x: jax.Array, eps: float = 1e-5, ddof: int = 1,
                     interpret: bool = False):
    """x: NHWC → (mean, std) each (N, C) float32."""
    n, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(n, hw, c)
    chunk = _pick_chunk(hw, c)
    grid = (n, pl.cdiv(hw, chunk))

    kernel = functools.partial(_stats_kernel, hw=hw, chunk=chunk,
                               eps=eps, ddof=ddof)
    # outputs are (N, 1, C) so the block's trailing dims (1, C) match the
    # array dims (Mosaic tiling constraint); squeezed on return
    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda i, k: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda i, k: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32)],
        interpret=interpret,
    )(xr)
    return mean[:, 0], std[:, 0]


def instance_mean_std_fast(x: jax.Array, eps: float = 1e-5, ddof: int = 1,
                           use_pallas: bool = True):
    """Dispatch: Pallas on TPU, jnp elsewhere.  Returns (N,1,1,C) like
    ops.stats.instance_mean_std."""
    if use_pallas and x.ndim == 4 and jax.default_backend() not in ("cpu",):
        n, h, w, c = x.shape
        mean, std = ins_stats_pallas(x, eps=eps, ddof=ddof)
        shape = (n, 1, 1, c)
        return (mean.reshape(shape).astype(x.dtype),
                std.reshape(shape).astype(x.dtype))
    return _jnp_stats(x, eps=eps, ddof=ddof)


def _stats_v2_kernel(x_ref, mean_ref, std_ref, *, hw, eps, ddof):
    x = x_ref[0].astype(jnp.float32)  # (HW, CB)
    s1 = jnp.sum(x, axis=0)
    s2 = jnp.sum(x * x, axis=0)
    n = jnp.float32(hw)
    mean = s1 / n
    var = s2 / n - mean * mean
    if ddof:
        var = var * (n / max(hw - ddof, 1))
    mean_ref[0, 0] = mean
    std_ref[0, 0] = jnp.sqrt(var + eps)


@functools.partial(jax.jit, static_argnames=("eps", "ddof", "interpret"))
def ins_stats_v2(x: jax.Array, eps: float = 1e-5, ddof: int = 1,
                 interpret: bool = False):
    """Retiled instance statistics: grid (N, C/128); each program reads
    one sample's full (HW, 128-lane) channel-block plane in a single
    VMEM pass (the tiling that made the fused eval-SelfNorm kernel beat
    XLA 1.19-1.39x — perf/pallas_sn.jsonl).  The v1 kernel's
    (N, HW-chunk) grid with running scratch accumulators measured slower
    than XLA; this shape streams contiguous planes instead.

    x: NHWC with C % 128 == 0 and the plane fitting VMEM.
    Returns (mean, std), each (N, C) float32."""
    n, h, w, c = x.shape
    hw = h * w
    cb = 128
    assert c % cb == 0, c
    xr = x.reshape(n, hw, c)
    grid = (n, c // cb)
    kernel = functools.partial(_stats_v2_kernel, hw=hw, eps=eps, ddof=ddof)
    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, hw, cb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        interpret=interpret,
    )(xr)
    return mean[:, 0], std[:, 0]


def ins_stats_v2_fits(h: int, w: int, c: int, itemsize: int = 2,
                      budget: int = 6 * 1024 * 1024) -> bool:
    """Whether one (HW, 128) plane (double-buffered) fits the VMEM budget."""
    return c % 128 == 0 and 2 * h * w * 128 * itemsize <= budget


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def ins_stats_diff(x: jax.Array, eps: float = 1e-5, ddof: int = 1,
                   interpret: bool = False):
    """Differentiable instance statistics on the v2 streaming kernel.

    Returns (mean, std), each (N, C) float32.  Backward is one fused
    jnp elementwise pass:
      dx = gm/n + gs*(x-mean)/((n-ddof)*std)
    (the analytic VJP of mean and of std = sqrt(var_ddof + eps))."""
    return ins_stats_v2(x, eps=eps, ddof=ddof, interpret=interpret)


def _ins_stats_diff_fwd(x, eps, ddof, interpret):
    mean, std = ins_stats_v2(x, eps=eps, ddof=ddof, interpret=interpret)
    return (mean, std), (x, mean, std)


def _ins_stats_diff_bwd(eps, ddof, interpret, res, g):
    x, mean, std = res
    gm, gs = g  # (N, C) each
    n, h, w, c = x.shape
    hw = h * w
    mb = mean.reshape(n, 1, 1, c)
    sb = std.reshape(n, 1, 1, c)
    gmb = gm.reshape(n, 1, 1, c)
    gsb = gs.reshape(n, 1, 1, c)
    denom = max(hw - ddof, 1)
    dx = gmb / hw + gsb * (x.astype(jnp.float32) - mb) / (denom * sb)
    return (dx.astype(x.dtype),)


ins_stats_diff.defvjp(_ins_stats_diff_fwd, _ins_stats_diff_bwd)
