"""Pallas TPU kernel: implicit-GEMM 3×3/stride-1 conv weight gradient.

The round-3 A/B showed XLA's conv-backward custom-calls beat XLA-level
im2col dot lowerings (tap-dots lost 4.5% end-to-end — the 9 shifted
slices re-read the activation 9× from HBM).  This kernel removes that
re-read: each grid step stages ONE padded input plane and one dy plane
in VMEM, then issues the 9 tap dot_generals against the *staged* copy —
HBM traffic is one read of x and dy total (the custom-call's own
minimum), and all FLOPs land on the MXU as (Cin × Ho·Wo)·(Ho·Wo × Cout)
matmuls accumulated into a resident (9·Cin, Cout) fp32 scratch.

dW[kh,kw,ci,co] = Σ_{b,h,w} xpad[b, h+kh, w+kw, ci] · dy[b,h,w,co]

Used by ops/convdot.py behind CNSN_CONV3X3=pallas (opt-in, A/B'd
end-to-end before any default flips — the round-2 lesson).  Reference
conv semantics: torch Conv2d backward (models/imagenet/resnet_cnsn.py
convs); numerics tested against jax autodiff.

Round-5 verdict (perf/r5_wgrad_tiled*.jsonl, README round-5 section):
the batch-tiled variant below closes the serialization gap and WINS
standalone on the layer4 shape class (−12.6%/call), but even
shape-gated to exactly those planes it loses the flagship step
end-to-end (2,286 vs 2,397 img/s) — the opaque custom-call breaks
XLA's fusion/pipelining around each site by more than the kernel
saves.  Both variants therefore stay opt-in; this file is the measured
baseline for future tilings, not a shipping default.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["wgrad3x3_pallas", "wgrad3x3_fits",
           "wgrad3x3_tiled", "wgrad3x3_tile_plan", "wgrad3x3_tiled_wins"]


def wgrad3x3_tiled_wins(b: int, h: int, w: int, cin: int, cout: int,
                        itemsize: int = 2) -> bool:
    """Measured-win shape class for the batch-tiled kernel on v5e
    (perf/r5_wgrad_tiled.jsonl, b128 bf16 kernel-level A/B): the
    small-spatial wide-channel planes — R50 layer4 (7x7, 512->512)
    beat the conv-backward custom-call 1.675 vs 1.916 ms/call
    (-12.6%); every larger-spatial plane lost (28^2: 2.115 vs 1.597)
    and the 56^2/14^2 plans crashed the remote Mosaic compile.  The
    CNSN_CONV3X3=pallas_tiled dispatch uses the kernel ONLY here and
    keeps jax's custom-call gradient elsewhere.
    CNSN_WGRAD_TILED_FORCE=1 drops the shape policy (test seam /
    re-measurement on other chips) but keeps the feasibility plan."""
    plan = wgrad3x3_tile_plan(b, h, w, cin, cout, itemsize)
    if os.environ.get("CNSN_WGRAD_TILED_FORCE") == "1":
        return plan is not None
    return h * w <= 64 and min(cin, cout) >= 512 and plan is not None


def wgrad3x3_fits(h: int, w: int, cin: int, cout: int,
                  itemsize: int = 2, budget: int = 12 * 1024 * 1024) -> bool:
    """VMEM feasibility for one-image-per-step staging."""
    xp_bytes = (h + 2) * (w + 2) * cin * itemsize
    dy_bytes = h * w * cout * itemsize
    out_bytes = 9 * cin * cout * 4
    return xp_bytes + dy_bytes + out_bytes < budget


def _kernel(xp_ref, dy_ref, out_ref, *, ho, wo, cin, cout):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xp = xp_ref[0].astype(jnp.float32)                    # (ho+2, wo+2, cin)
    dy = dy_ref[0].astype(jnp.float32).reshape(ho * wo, cout)
    for kh in range(3):
        for kw in range(3):
            xs = xp[kh:kh + ho, kw:kw + wo, :].reshape(ho * wo, cin)
            acc = jax.lax.dot_general(
                xs, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (cin, cout)
            t = kh * 3 + kw
            out_ref[t * cin:(t + 1) * cin, :] += acc


def wgrad3x3_tile_plan(b: int, h: int, w: int, cin: int, cout: int,
                       itemsize: int = 2,
                       budget: int = 12 * 1024 * 1024,
                       slice_budget: int = 1024 * 1024):
    """Pick ``(bt, cout_t)`` for the batch-tiled kernel, or None.

    Preference order: the largest Cout tile first (each extra Cout tile
    re-reads every x plane from HBM once), then the largest feasible
    batch tile (bigger K = bt·Ho·Wo per MXU dot, fewer serial grid
    steps).  Feasibility: double-buffered input blocks plus the
    resident fp32 (9·Cin, Cout_t) output block inside the VMEM budget
    (~16 MB/core on v5e; 12 MB leaves headroom for Mosaic's own
    staging), AND the merged (bt·Ho·Wo, C) tap-slice copies under
    ``slice_budget`` — measured on v5e: 0.8 MB operand copies compile,
    1.6 MB crash the Mosaic pipeline (layer1 bt=4 / layer2 bt=8 /
    layer3 bt=16 all die in tpu_compile_helper; bt halved each
    compiles and runs).  bt is capped at 32 — beyond that K growth is
    flat while the grid loses the steps Mosaic needs to overlap HBM
    reads.
    """
    for cout_t in (c for c in (cout, 512, 256, 128)
                   if c <= cout and cout % c == 0):
        out_bytes = 9 * cin * cout_t * 4
        per_img = ((h + 2) * (w + 2) * cin + h * w * cout_t) * itemsize
        slice_per_img = h * w * max(cin, cout_t) * itemsize
        bt = max((d for d in range(1, min(b, 32) + 1) if b % d == 0
                  and 2 * d * per_img + out_bytes <= budget
                  and d * slice_per_img <= slice_budget),
                 default=0)
        if bt >= 2:
            return bt, cout_t
    return None


def _tiled_kernel(xp_ref, dy_ref, out_ref, *, ho, wo, cin, cout_t, bt):
    ib = pl.program_id(1)

    @pl.when(ib == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xp = xp_ref[...]                                  # (bt, ho+2, wo+2, cin)
    dy = dy_ref[...].reshape(bt * ho * wo, cout_t)
    for kh in range(3):
        for kw in range(3):
            xs = xp[:, kh:kh + ho, kw:kw + wo, :].reshape(bt * ho * wo, cin)
            # native-dtype (bf16) MXU dot with fp32 accumulation — the
            # one-image kernel's pre-cast to f32 forced f32 MXU passes
            acc = jax.lax.dot_general(
                xs, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (cin, cout_t)
            t = kh * 3 + kw
            out_ref[t * cin:(t + 1) * cin, :] += acc


def wgrad3x3_tiled(x: jax.Array, dy: jax.Array, padding: int = 1,
                   interpret: bool = False,
                   plan=None) -> jax.Array:
    """(B,H,W,Cin) x, (B,H,W,Cout) dy → (3,3,Cin,Cout) fp32 dW for the
    3×3/s1/'same' conv — batch-tiled implicit GEMM.

    The round-3 one-image kernel serialized B small-K matmuls (its own
    post-mortem); this is the diagnosed fix: grid over
    (Cout-tile, B-tile) with the B-tile folded into the dot's
    contraction (K = bt·Ho·Wo) and the (9·Cin, Cout_t) fp32 block
    accumulated across sequential B-tile steps
    (dimension_semantics=('parallel', 'arbitrary') lets Mosaic pipeline
    the HBM reads of the next B-tile against the current dots).
    Reference conv semantics: torch Conv2d backward
    (models/imagenet/resnet_cnsn.py convs); numerics vs jax autodiff in
    tests/test_pallas_wgrad.py.
    """
    b, h, w, cin = x.shape
    cout = dy.shape[-1]
    assert dy.shape[:3] == (b, h, w), (x.shape, dy.shape)
    if plan is None:
        plan = wgrad3x3_tile_plan(b, h, w, cin, cout,
                                  jnp.dtype(x.dtype).itemsize)
    assert plan is not None, (x.shape, dy.shape)
    bt, cout_t = plan
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_tiled_kernel, ho=h, wo=w, cin=cin,
                          cout_t=cout_t, bt=bt),
        grid=(cout // cout_t, b // bt),
        in_specs=[
            pl.BlockSpec((bt, h + 2 * padding, w + 2 * padding, cin),
                         lambda j, i: (i, 0, 0, 0)),
            pl.BlockSpec((bt, h, w, cout_t), lambda j, i: (i, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout_t), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, dy)
    return out.reshape(3, 3, cin, cout)


def wgrad3x3_pallas(x: jax.Array, dy: jax.Array, padding: int = 1,
                    interpret: bool = False) -> jax.Array:
    """(B,H,W,Cin) x, (B,H,W,Cout) dy → (3,3,Cin,Cout) fp32 dW for the
    3×3/s1/'same' conv.  One image per sequential grid step."""
    b, h, w, cin = x.shape
    cout = dy.shape[-1]
    assert dy.shape[:3] == (b, h, w), (x.shape, dy.shape)
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, ho=h, wo=w, cin=cin, cout=cout),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * padding, w + 2 * padding, cin),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        interpret=interpret,
    )(xp, dy)
    return out.reshape(3, 3, cin, cout)
