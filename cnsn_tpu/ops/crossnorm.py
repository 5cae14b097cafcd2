"""Functional 2-instance CrossNorm (style-statistics transfer).

TPU-native redesign of the reference CrossNorm op
(reference: models/cnsn.py:20-29 ``instance_norm_mix`` and :58-91
``cn_op_2ins_space_chan``):

  * the stateful ``.active`` flag / host RNG protocol becomes explicit
    ``jax.random`` keys and a boolean gate, so the op is pure and lives
    inside one jitted train step;
  * dynamic crops become static-shape masked statistics + mask
    compositing (mathematically identical, XLA-friendly);
  * instance pairing is a device-side random permutation; under data
    parallelism it is sampled blockwise per shard to reproduce the
    reference's per-GPU ``torch.randperm`` pairing semantics
    (DataParallel scatters the batch — cifar.py:395).

All four crop modes of the reference are supported, plus the two dead
options (``chan`` channel shuffle, ``lam`` beta-mix) kept for knob
parity.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .bbox import sample_bbox
from .stats import instance_mean_std, masked_instance_mean_std, region_mask

__all__ = ["instance_norm_mix", "cross_norm_2ins", "grouped_permutation"]

CROP_MODES = ("neither", "style", "content", "both")


def instance_norm_mix(content: jax.Array, style: jax.Array,
                      eps: float = 1e-5) -> jax.Array:
    """Replace content's per-(N,C) stats with style's (AdaIN transfer).

    NHWC; spatial sizes may differ, (N, C) must match.
    Reference: models/cnsn.py:20-29.
    """
    if content.shape[0] != style.shape[0] or content.shape[3] != style.shape[3]:
        raise ValueError("content/style must match in (N, C)")
    s_mean, s_std = instance_mean_std(style, eps=eps)
    c_mean, c_std = instance_mean_std(content, eps=eps)
    return (content - c_mean) / c_std * s_std + s_mean


def grouped_permutation(key: jax.Array, n: int, num_groups: int = 1) -> jax.Array:
    """Random permutation of [0, n) that stays within contiguous blocks.

    With ``num_groups`` equal to the data-parallel degree and the batch
    sharded on its leading axis, every index is permuted within its own
    shard, so the gather ``x[perm]`` never crosses devices — the
    TPU-native counterpart of per-GPU ``torch.randperm`` pairing.
    """
    if n % num_groups != 0:
        raise ValueError(f"batch {n} not divisible by num_groups {num_groups}")
    g = n // num_groups
    keys = jax.random.split(key, num_groups)
    perms = [jax.random.permutation(k, g) + i * g for i, k in enumerate(keys)]
    return jnp.concatenate(perms, axis=0)


def cross_norm_2ins(
    x: jax.Array,
    key: jax.Array,
    crop: str = "neither",
    beta: float = 1.0,
    bbx_thres: float = 0.1,
    lam: Optional[float] = None,
    chan: bool = False,
    num_groups: int = 1,
    eps: float = 1e-5,
) -> jax.Array:
    """2-instance CrossNorm on an NHWC batch.

    Pairs each instance with a random partner and transfers the
    partner's per-channel spatial statistics onto it; ``crop`` selects
    where stats are taken from ('style') and/or where the transfer is
    applied ('content').  Reference: models/cnsn.py:58-91.
    """
    if crop not in CROP_MODES:
        raise ValueError(f"crop must be one of {CROP_MODES}, got {crop!r}")
    n, h, w, c = x.shape
    k_perm, k_style, k_content, k_chan = jax.random.split(key, 4)

    perm = grouped_permutation(k_perm, n, num_groups)

    # TPU-first formulation: CrossNorm consumes only the partner's
    # *statistics*, so gather the (N, C) stats along the batch axis
    # instead of the full activation (a pixel gather — and its
    # scatter-add VJP — is the dominant cost on TPU; the stats gather
    # is ~HW times smaller).  The bbox is shared by the whole batch,
    # so stats(x2[bbox]) == stats(x[bbox])[perm] exactly.
    if crop in ("style", "both"):
        sh1, sh2, sw1, sw2 = sample_bbox(k_style, h, w, beta=beta,
                                         bbx_thres=bbx_thres)
        smask = region_mask(h, w, sh1, sh2, sw1, sw2)
        s_mean_all, s_std_all = masked_instance_mean_std(x, smask, eps=eps)
    else:
        s_mean_all, s_std_all = instance_mean_std(x, eps=eps)
    s_mean = jnp.take(s_mean_all, perm, axis=0)
    s_std = jnp.take(s_std_all, perm, axis=0)
    if chan:
        chan_perm = jax.random.permutation(k_chan, c)
        s_mean = jnp.take(s_mean, chan_perm, axis=3)
        s_std = jnp.take(s_std, chan_perm, axis=3)

    # Content: transfer everywhere, or only inside a random bbox.
    if crop in ("content", "both"):
        ch1, ch2, cw1, cw2 = sample_bbox(k_content, h, w, beta=beta,
                                         bbx_thres=bbx_thres)
        cmask = region_mask(h, w, ch1, ch2, cw1, cw2)
        c_mean, c_std = masked_instance_mean_std(x, cmask, eps=eps)
        mixed = (x - c_mean) / c_std * s_std + s_mean
        x_aug = jnp.where(cmask.astype(bool), mixed, x)
    else:
        c_mean, c_std = instance_mean_std(x, eps=eps)
        x_aug = (x - c_mean) / c_std * s_std + s_mean

    if lam is not None:
        x_aug = x * lam + x_aug * (1.0 - lam)
    return x_aug.astype(x.dtype)


def cross_norm_fma(
    x: jax.Array,
    key: jax.Array,
    active: jax.Array,
    crop: str = "neither",
    beta: float = 1.0,
    bbx_thres: float = 0.1,
    lam: Optional[float] = None,
    chan: bool = False,
    num_groups: int = 1,
    eps: float = 1e-5,
) -> jax.Array:
    """Branchless CrossNorm: identical math to :func:`cross_norm_2ins`
    with the ``active`` gate folded into per-(N, C) scale/shift scalars
    instead of a ``lax.cond``.

    out = x·scale + shift, where scale = σ_s/σ_c and
    shift = μ_s − μ_c·scale when active (1 / 0 when not).  Statistics
    are computed unconditionally — one extra reduction pass — but the
    apply is a single FMA that XLA fuses into neighboring ops, with no
    conditional boundary in either the forward or backward program.
    Preferable when the site count is small or sites are usually
    active; the cond implementation wins when most sites are idle.
    """
    if crop not in CROP_MODES:
        raise ValueError(f"crop must be one of {CROP_MODES}, got {crop!r}")
    n, h, w, c = x.shape
    k_perm, k_style, k_content, k_chan = jax.random.split(key, 4)
    perm = grouped_permutation(k_perm, n, num_groups)

    if crop in ("style", "both"):
        sh1, sh2, sw1, sw2 = sample_bbox(k_style, h, w, beta=beta,
                                         bbx_thres=bbx_thres)
        smask = region_mask(h, w, sh1, sh2, sw1, sw2)
        s_mean_all, s_std_all = masked_instance_mean_std(x, smask, eps=eps)
    else:
        s_mean_all, s_std_all = instance_mean_std(x, eps=eps)
    s_mean = jnp.take(s_mean_all, perm, axis=0)
    s_std = jnp.take(s_std_all, perm, axis=0)
    if chan:
        chan_perm = jax.random.permutation(k_chan, c)
        s_mean = jnp.take(s_mean, chan_perm, axis=3)
        s_std = jnp.take(s_std, chan_perm, axis=3)

    if crop in ("content", "both"):
        ch1, ch2, cw1, cw2 = sample_bbox(k_content, h, w, beta=beta,
                                         bbx_thres=bbx_thres)
        cmask = region_mask(h, w, ch1, ch2, cw1, cw2).astype(bool)
        c_mean, c_std = masked_instance_mean_std(x, cmask, eps=eps)
    else:
        cmask = None
        c_mean, c_std = instance_mean_std(x, eps=eps)

    ct = jnp.promote_types(x.dtype, jnp.float32)
    scale = (s_std / c_std).astype(ct)
    shift = (s_mean - c_mean * scale).astype(ct)
    if lam is not None:
        scale = lam + (1.0 - lam) * scale
        shift = (1.0 - lam) * shift
    one = jnp.ones_like(scale)
    zero = jnp.zeros_like(shift)
    scale = jnp.where(active, scale, one)
    shift = jnp.where(active, shift, zero)
    out = x.astype(ct) * scale + shift
    if cmask is not None:
        out = jnp.where(cmask, out, x.astype(ct))
    return out.astype(x.dtype)
