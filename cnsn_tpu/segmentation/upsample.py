"""Class-major matmul upsampling + fused CE for segmentation heads.

The shipped gtav step spends 43% of its 687 ms in two fusions around
the full-resolution logits (perf/r3_seg_trace.txt): (B, 713, 713, 19)
keeps the 19-class axis minor, which TPU pads to 128 lanes — every
elementwise/CE/resize-backward pass over the logits costs 6.7× its
logical bytes (4.2 GB per fp32 pass at b16).

This module computes the SAME math in a class-major layout where the
class axis is a batch dimension and W rides the lanes (713 → 768 pad,
7.7%):

  * bilinear upsampling as two dense matmuls with precomputed 2-tap
    interpolation matrices (exactly ``jax.image.resize('bilinear')``,
    i.e. torch F.interpolate(align_corners=False) — the reference's
    logits upsample, segmentation/model/fcn.py forward);
  * masked CE via logsumexp + a broadcast-compare one-hot contraction
    (no gather, no class-minor materialization);
  * upsample+argmax for prediction/metrics.

Selected by SegStepFns via CNSN_SEG_CE=matmul; equality-tested against
the resize+NHWC path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bilinear_matrix", "upsample_nll_sum", "upsample_argmax"]


@functools.lru_cache(maxsize=32)
def bilinear_matrix(out_size: int, in_size: int,
                    align_corners: bool = False) -> np.ndarray:
    """(out, in) fp32 interpolation matrix reproducing
    jax.image.resize 'bilinear' (half-pixel centers, edge clamp), or
    — with ``align_corners=True`` — torch
    F.interpolate(align_corners=True) as used by the PSP/PSA heads
    (pspnet.py:_resize_align_corners).

    Upscale only: resize antialiases (widens the triangle) when
    downscaling, which a 2-tap matrix does not reproduce."""
    if out_size < in_size:
        raise ValueError(f"upscale only ({in_size} -> {out_size})")
    if align_corners:
        src = (np.linspace(0.0, in_size - 1.0, out_size)
               if out_size > 1 else np.zeros(1))
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(src)
    f = src - x0
    m = np.zeros((out_size, in_size), np.float32)
    lo = np.clip(x0.astype(np.int64), 0, in_size - 1)
    hi = np.clip(x0.astype(np.int64) + 1, 0, in_size - 1)
    np.add.at(m, (np.arange(out_size), lo), (1.0 - f).astype(np.float32))
    np.add.at(m, (np.arange(out_size), hi), f.astype(np.float32))
    return m


def _upsample_cmajor(logits_lr: jax.Array, out_h: int, out_w: int,
                     align_corners: bool = False):
    """(B, h, w, K) NHWC low-res → (B, K, H, W) class-major high-res."""
    b, h, w, k = logits_lr.shape
    z = jnp.transpose(logits_lr.astype(jnp.float32), (0, 3, 1, 2))
    ah = jnp.asarray(bilinear_matrix(out_h, h, align_corners))
    aw = jnp.asarray(bilinear_matrix(out_w, w, align_corners))
    z = jnp.einsum("Hh,bkhw->bkHw", ah, z)
    return jnp.einsum("Ww,bkHw->bkHW", aw, z)


def upsample_nll_sum(logits_lr: jax.Array, labels: jax.Array,
                     ignore_label: int = 255,
                     align_corners: bool = False):
    """(nll_sum, valid_count) of CE(upsample(logits), labels) — equal to
    masked_cross_entropy on the resized NHWC logits, without ever
    building a class-minor full-resolution tensor."""
    b, out_h, out_w = labels.shape
    k = logits_lr.shape[-1]
    z = _upsample_cmajor(logits_lr, out_h, out_w, align_corners)

    zmax = jnp.max(z, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(z - zmax), axis=1)) + zmax[:, 0]

    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    onehot = (safe[:, None] ==
              jnp.arange(k, dtype=labels.dtype)[None, :, None, None])
    z_label = jnp.sum(jnp.where(onehot, z, 0.0), axis=1)

    nll = jnp.where(valid, lse - z_label, 0.0)
    return jnp.sum(nll), jnp.sum(valid)


def upsample_argmax(logits_lr: jax.Array, out_h: int, out_w: int,
                    align_corners: bool = False) -> jax.Array:
    """argmax over classes of the upsampled logits, (B, H, W) int32."""
    z = _upsample_cmajor(logits_lr, out_h, out_w, align_corners)
    return jnp.argmax(z, axis=1).astype(jnp.int32)
