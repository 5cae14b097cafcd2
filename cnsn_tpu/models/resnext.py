"""ResNeXt-29 (4x32d) with CNSN, NHWC / Flax.

Parity with the reference CIFAR ResNeXt
(reference: models/cifar/resnext_cnsn.py:13-240): bottleneck type C with
grouped 3x3 conv, CNSN at {residual, identity, pre, post}; 9 bottleneck
sites.  The reference's quirk where a 'identity'-pos CNSN output is
overwritten by downsample(x) is reproduced — the CNSN still runs (its
SelfNorm batch-stats update is observable) but its output is discarded
when a downsample exists (reference :102-106).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.cnsn import CNSN
from ..nn.norm import BatchNorm
from .common import conv_he_fanout, linear_kaiming_normal

__all__ = ["CifarResNeXt", "resnext29"]


class ResNeXtBottleneck(nn.Module):
    inplanes: int
    planes: int
    cardinality: int
    base_width: int
    pos: str
    cnsn_type: str
    crop: str
    beta: float
    stride: int = 1
    has_downsample: bool = False
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        assert self.pos in ("residual", "identity", "pre", "post")
        ura = not train
        dim = int(math.floor(self.planes * (self.base_width / 64.0)))
        width = dim * self.cardinality
        out_ch = self.planes * self.expansion
        sn_feats = self.inplanes if self.pos in ("pre", "identity") else out_ch
        cnsn = CNSN(features=sn_feats, cnsn_type=self.cnsn_type, crop=self.crop,
                    beta=self.beta, num_groups=self.num_groups, name="cnsn")

        residual = x
        if self.pos == "pre":
            x = cnsn(x, active, ura)

        b = conv_he_fanout(width, 1, 1, padding=0, dtype=self.dtype, name="conv_reduce")(x)
        b = nn.relu(BatchNorm(width, name="bn_reduce")(b, ura))
        b = conv_he_fanout(width, 3, self.stride, groups=self.cardinality,
                           dtype=self.dtype, name="conv_conv")(b)
        b = nn.relu(BatchNorm(width, name="bn")(b, ura))
        b = conv_he_fanout(out_ch, 1, 1, padding=0, dtype=self.dtype, name="conv_expand")(b)
        b = BatchNorm(out_ch, name="bn_expand")(b, ura)

        if self.pos == "residual":
            b = cnsn(b, active, ura)
        if self.pos == "identity":
            residual = cnsn(residual, active, ura)

        if self.has_downsample:
            # NB: overwrites an 'identity'-pos CNSN result (reference quirk).
            residual = conv_he_fanout(out_ch, 1, self.stride, padding=0,
                                      dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(out_ch, name="downsample_bn")(residual, ura)

        out = nn.relu(residual + b)
        if self.pos == "post":
            out = cnsn(out, active, ura)
        return out


class CifarResNeXt(nn.Module):
    depth: int = 29
    cardinality: int = 4
    base_width: int = 32
    num_classes: int = 10
    pos: str = "residual"
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: str = "cnsn"
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32

    @property
    def layer_blocks(self) -> int:
        assert (self.depth - 2) % 9 == 0
        return (self.depth - 2) // 9

    @property
    def cn_num(self) -> int:
        return 3 * self.layer_blocks if "cn" in self.cnsn_type else 0

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None):
        ura = not train
        x = conv_he_fanout(64, 3, 1, dtype=self.dtype, name="conv_1_3x3")(x)
        x = nn.relu(BatchNorm(64, name="bn_1")(x, ura))

        inplanes = 64
        site = 0
        for s, planes in enumerate((64, 128, 256)):
            stride = 1 if s == 0 else 2
            for i in range(self.layer_blocks):
                blk_stride = stride if i == 0 else 1
                has_ds = (i == 0) and (blk_stride != 1 or inplanes != planes * 4)
                active = None if cn_active is None else cn_active[site]
                x = ResNeXtBottleneck(
                    inplanes, planes, self.cardinality, self.base_width,
                    pos=self.pos, cnsn_type=self.cnsn_type, crop=self.crop,
                    beta=self.beta, stride=blk_stride, has_downsample=has_ds,
                    num_groups=self.num_groups, dtype=self.dtype,
                    name=f"stage{s + 1}_{i}")(x, train, active)
                inplanes = planes * 4
                site += 1

        x = jnp.mean(x, axis=(1, 2))  # AvgPool2d(8) on 8x8 map
        return linear_kaiming_normal(self.num_classes, dtype=self.dtype, name="classifier")(x)


def resnext29(num_classes: int = 10, cardinality: int = 4,
              base_width: int = 32, **kw) -> CifarResNeXt:
    """reference models/cifar/resnext_cnsn.py:236-240 factory."""
    return CifarResNeXt(depth=29, cardinality=cardinality,
                        base_width=base_width, num_classes=num_classes, **kw)
