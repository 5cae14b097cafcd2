"""Convolution with hand-lowered MXU-friendly gradients.

The profiled flagship step spends 54% of its time inside XLA's conv
*backward* custom-calls at ~half the forward's MXU efficiency (README
roofline, perf traces r2).  The two backward ops have very different
structure:

  * wgrad — jax autodiff expresses dW as a convolution whose "batch"
    axis is Cin and whose window is the full dy extent (a giant-window,
    few-channel conv: the shape class TPU conv custom-calls handle
    worst).  Here it is lowered instead to K*K tap-wise
    ``dot_general``s: dW[kh,kw] = x_shifted . dy contracting
    (B, Ho, Wo) — clean (Cin x BHoWo)·(BHoWo x Cout) matmuls with fp32
    accumulation, bit-comparable to the custom-call result.
  * dgrad (stride 1) — mathematically a *plain forward conv* of dy with
    the spatially-flipped, in/out-transposed kernel; emitting it as one
    makes XLA use the same custom-call class as the forward pass (which
    the trace puts at the MXU floor) instead of the "transposed conv"
    backward path.

Both lowerings are opt-in per side (the forward is always the stock
``conv_general_dilated``), so end-to-end A/Bs can attribute the win; the
non-lowered side reproduces jax's default gradient exactly via
``jax.vjp`` of the forward.

Reference context: the reference's convs are cuDNN via torch
(e.g. models/imagenet/resnet_cnsn.py:37-124); this module exists purely
for the TPU backward-lowering experiment — same math, same param shape.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d_custom_bwd"]


def _fwd_conv(x, k, stride, padding):
    return lax.conv_general_dilated(
        x, k, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv2d_custom_bwd(x, k, stride: int, padding: int,
                      wgrad: str = "dot", dgrad: str = "dot"):
    """NHWC/HWIO conv; forward = stock conv_general_dilated; backward
    per ``wgrad``/``dgrad``: 'dot' = MXU dot lowering, 'auto' = jax's
    default transpose rule (via jax.vjp of the forward)."""
    return _fwd_conv(x, k, stride, padding)


def _vjp_fwd(x, k, stride, padding, wgrad, dgrad):
    return _fwd_conv(x, k, stride, padding), (x, k)


def _wgrad_taps(x, dy, kshape, stride, padding):
    """dW[kh,kw,ci,co] = sum_{b,h,w} x_pad[b, s*h+kh, s*w+kw, ci] *
    dy[b,h,w,co] — one dot_general per kernel tap, contracting
    (B, Ho, Wo), accumulated in fp32."""
    kh_n, kw_n, cin, cout = kshape
    b = x.shape[0]
    ho, wo = dy.shape[1], dy.shape[2]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    taps = []
    for kh in range(kh_n):
        for kw in range(kw_n):
            xs = lax.slice(
                xp, (0, kh, kw, 0),
                (b, kh + stride * (ho - 1) + 1,
                 kw + stride * (wo - 1) + 1, cin),
                (1, stride, stride, 1))
            taps.append(lax.dot_general(
                xs, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(kshape)


def _dgrad_flip_conv(dy, k, padding):
    """Stride-1 dgrad as a plain forward conv: correlate dy with the
    spatially-flipped kernel, in/out channels swapped, padding K-1-p."""
    kt = jnp.flip(k, (0, 1)).swapaxes(2, 3)  # (K, K, Cout, Cin)
    p = k.shape[0] - 1 - padding
    return lax.conv_general_dilated(
        dy, kt, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _vjp_bwd(stride, padding, wgrad, dgrad, res, dy):
    x, k = res

    use_pallas = False
    if (wgrad in ("pallas", "pallas_tiled") and stride == 1
            and k.shape[:2] == (3, 3)):
        from .pallas import pallas_dispatch
        ok, interp = pallas_dispatch()
        if wgrad == "pallas":
            from .pallas.conv_wgrad import wgrad3x3_fits
            use_pallas = ok and wgrad3x3_fits(
                x.shape[1], x.shape[2], x.shape[3], dy.shape[-1],
                jnp.dtype(x.dtype).itemsize)
        else:
            # shape-gated: the batch-tiled kernel only where it beat
            # the custom-call (wgrad3x3_tiled_wins); elsewhere the
            # autodiff custom-call path below
            from .pallas.conv_wgrad import wgrad3x3_tiled_wins
            use_pallas = ok and wgrad3x3_tiled_wins(
                x.shape[0], x.shape[1], x.shape[2], x.shape[3],
                dy.shape[-1], jnp.dtype(x.dtype).itemsize)

    need_auto = (not use_pallas and wgrad != "dot") \
        or not (dgrad == "dot" and stride == 1)
    if need_auto:
        _, pullback = jax.vjp(
            lambda x_, k_: _fwd_conv(x_, k_, stride, padding), x, k)
        dx_auto, dk_auto = pullback(dy)

    if use_pallas and wgrad == "pallas_tiled":
        from .pallas.conv_wgrad import wgrad3x3_tiled
        dk = wgrad3x3_tiled(x, dy, padding, interp).astype(k.dtype)
    elif use_pallas:
        from .pallas.conv_wgrad import wgrad3x3_pallas
        dk = wgrad3x3_pallas(x, dy, padding, interp).astype(k.dtype)
    elif wgrad == "dot":
        dk = _wgrad_taps(x, dy, k.shape, stride, padding).astype(k.dtype)
    else:
        dk = dk_auto

    if dgrad == "dot" and stride == 1:
        dx = _dgrad_flip_conv(dy, k, padding).astype(x.dtype)
    else:
        # stride>1 dgrad is a genuinely dilated conv; keep jax's rule
        dx = dx_auto

    return dx, dk


conv2d_custom_bwd.defvjp(_vjp_fwd, _vjp_bwd)
