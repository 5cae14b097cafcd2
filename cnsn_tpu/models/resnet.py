"""ImageNet ResNet-50 (v1.5) with CNSN, NHWC / Flax.

Parity with the reference ImageNet ResNet
(reference: models/imagenet/resnet_cnsn.py:37-323): stride on the 3x3
conv (v1.5), CNSN at {residual, pre, post, identity} per bottleneck,
``cnsn_type=None`` → plain bottleneck (used when CrossNorm is applied in
image space before the model — imagenet.py:214-215).  16 bottleneck
sites; adaptive global average pool head.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.cnsn import CNSN
from ..nn.norm import BatchNorm
from .common import S2DStem, conv_he_fanout, linear_torch_default

__all__ = ["ResNet", "resnet50"]


class Bottleneck(nn.Module):
    inplanes: int
    planes: int
    pos: Optional[str]
    cnsn_type: Optional[str]
    crop: str
    beta: float
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        ura = not train
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion

        cnsn = None
        if self.cnsn_type is not None:
            assert self.pos in ("residual", "pre", "post", "identity")
            sn_feats = self.inplanes if self.pos == "pre" else out_ch
            cnsn = CNSN(features=sn_feats, cnsn_type=self.cnsn_type,
                        crop=self.crop, beta=self.beta,
                        num_groups=self.num_groups, name="cnsn")

        identity = x
        out = x
        if cnsn is not None and self.pos == "pre":
            out = cnsn(out, active, ura)

        out = conv_he_fanout(width, 1, 1, padding=0, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(BatchNorm(width, name="bn1")(out, ura))
        out = conv_he_fanout(width, 3, self.stride, groups=self.groups,
                             dtype=self.dtype, name="conv2")(out)
        out = nn.relu(BatchNorm(width, name="bn2")(out, ura))
        out = conv_he_fanout(out_ch, 1, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(out_ch, name="bn3")(out, ura)

        if self.has_downsample:
            identity = conv_he_fanout(out_ch, 1, self.stride, padding=0,
                                      dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(out_ch, name="downsample_bn")(identity, ura)

        if cnsn is not None:
            if self.pos == "residual":
                out = cnsn(out, active, ura)
            elif self.pos == "identity":
                identity = cnsn(identity, active, ura)

        out = out + identity
        if cnsn is not None and self.pos == "post":
            out = cnsn(out, active, ura)
        return nn.relu(out)


class ResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    pos: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: Optional[str] = None
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    remat: bool = False  # rematerialize each bottleneck (memory for FLOPs)
    # 's2d' (default): 7x7/s2 stem as a 4x4/s1 conv on space-to-depth
    # input — algebraically identical, same param tree, measured +5%
    # plain / +16% flagship on v5e (the C=3 strided stem is the drag);
    # 'conv' restores the literal 7x7/s2 lowering.  Env: CNSN_STEM.
    stem: str = os.environ.get("CNSN_STEM", "s2d")

    @property
    def cn_num(self) -> int:
        if self.cnsn_type is not None and "cn" in self.cnsn_type:
            return sum(self.layers)
        return 0

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None):
        ura = not train
        if self.stem == "s2d":
            x = S2DStem(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = conv_he_fanout(64, 7, 2, padding=3, dtype=self.dtype,
                               name="conv1")(x)
        x = nn.relu(BatchNorm(64, name="bn1")(x, ura))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # static_argnums: (x, train, active) → `train` (python bool) is
        # arg index 2 (flax counts self as 0)
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        inplanes = 64
        site = 0
        for s, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if s == 0 else 2
            for i in range(blocks):
                blk_stride = stride if i == 0 else 1
                has_ds = (i == 0) and (blk_stride != 1 or inplanes != planes * 4)
                active = None if cn_active is None else cn_active[site]
                x = block_cls(
                    inplanes, planes, pos=self.pos, cnsn_type=self.cnsn_type,
                    crop=self.crop, beta=self.beta, stride=blk_stride,
                    has_downsample=has_ds, groups=self.groups,
                    base_width=self.width_per_group,
                    num_groups=self.num_groups, dtype=self.dtype,
                    name=f"layer{s + 1}_{i}")(x, train, active)
                inplanes = planes * 4
                site += 1

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        return linear_torch_default(self.num_classes, dtype=self.dtype, name="fc")(x)


def resnet50(num_classes: int = 1000, **kw) -> ResNet:
    """reference models/imagenet/resnet_cnsn.py:309-323 factory."""
    return ResNet(layers=(3, 4, 6, 3), num_classes=num_classes, **kw)
