"""ResNet-50-IBN-a / -b with CNSN, NHWC / Flax.

Parity with the reference IBN ResNet
(reference: models/imagenet/resnet_ibn_cnsn.py:24-315):

  * IBN-a: bn1 of every bottleneck in 'a' stages is an IBN layer (half
    InstanceNorm / half BatchNorm); ibn_cfg ('a','a','a',None).
  * IBN-b: affine InstanceNorm applied **after** the residual add, only
    in the *last* block of 'b' stages (and on the stem); those blocks
    skip their CNSN when pos='post'; ibn_cfg ('b','b',None,None).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.cnsn import CNSN
from ..nn.norm import BatchNorm, IBN, InstanceNorm
from .common import S2DStem, conv_he_fanout, linear_torch_default

__all__ = ["ResNetIBN", "resnet50_ibn_a", "resnet50_ibn_b"]


class BottleneckIBN(nn.Module):
    inplanes: int
    planes: int
    pos: Optional[str]
    cnsn_type: Optional[str]
    crop: str
    beta: float
    ibn: Optional[str] = None  # None | 'a' | 'b'
    stride: int = 1
    has_downsample: bool = False
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        ura = not train
        out_ch = self.planes * self.expansion
        has_post_in = self.ibn == "b"

        cnsn = None
        if self.cnsn_type is not None and not (has_post_in and self.pos == "post"):
            assert self.pos in ("residual", "pre", "post", "identity")
            sn_feats = self.inplanes if self.pos == "pre" else out_ch
            cnsn = CNSN(features=sn_feats, cnsn_type=self.cnsn_type,
                        crop=self.crop, beta=self.beta,
                        num_groups=self.num_groups, name="cnsn")

        identity = x
        if cnsn is not None and self.pos == "pre":
            x = cnsn(x, active, ura)

        out = conv_he_fanout(self.planes, 1, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        if self.ibn == "a":
            out = IBN(self.planes, name="bn1")(out, ura)
        else:
            out = BatchNorm(self.planes, name="bn1")(out, ura)
        out = nn.relu(out)
        out = conv_he_fanout(self.planes, 3, self.stride, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(BatchNorm(self.planes, name="bn2")(out, ura))
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
        if has_post_in:
            out = InstanceNorm(out_ch, name="IN")(out)
        elif cnsn is not None and self.pos == "post":
            out = cnsn(out, active, ura)
        return nn.relu(out)


class ResNetIBN(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    ibn_cfg: Sequence[Optional[str]] = ("a", "a", "a", None)
    num_classes: int = 1000
    pos: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: Optional[str] = None
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    remat: bool = False  # rematerialize each bottleneck (memory for FLOPs)
    stem: str = os.environ.get("CNSN_STEM", "s2d")  # see models/resnet.py

    def _block_ibn(self, stage_ibn: Optional[str], i: int, blocks: int):
        """Per-block ibn flag: 'b' stages place IN only on the last block
        (reference resnet_ibn_cnsn.py:209-218)."""
        if stage_ibn == "b":
            return "b" if i == blocks - 1 else None
        return stage_ibn

    def _has_cnsn(self, stage_ibn, i, blocks):
        if self.cnsn_type is None:
            return False
        blk_ibn = self._block_ibn(stage_ibn, i, blocks)
        return not (blk_ibn == "b" and self.pos == "post")

    @property
    def cn_num(self) -> int:
        if self.cnsn_type is None or "cn" not in self.cnsn_type:
            return 0
        n = 0
        for stage_ibn, blocks in zip(self.ibn_cfg, self.layers):
            for i in range(blocks):
                n += int(self._has_cnsn(stage_ibn, i, blocks))
        return n

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None):
        ura = not train
        if self.stem == "s2d":
            x = S2DStem(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = conv_he_fanout(64, 7, 2, padding=3, dtype=self.dtype,
                               name="conv1")(x)
        if self.ibn_cfg[0] == "b":
            x = InstanceNorm(64, name="bn1")(x)
        else:
            x = BatchNorm(64, name="bn1")(x, ura)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = (nn.remat(BottleneckIBN, static_argnums=(2,))
                     if self.remat else BottleneckIBN)
        inplanes = 64
        site = 0
        for s, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if s == 0 else 2
            stage_ibn = self.ibn_cfg[s]
            for i in range(blocks):
                blk_stride = stride if i == 0 else 1
                has_ds = (i == 0) and (blk_stride != 1 or inplanes != planes * 4)
                active = None
                if self._has_cnsn(stage_ibn, i, blocks):
                    if cn_active is not None:
                        active = cn_active[site]
                    site += 1
                x = block_cls(
                    inplanes, planes, pos=self.pos, cnsn_type=self.cnsn_type,
                    crop=self.crop, beta=self.beta,
                    ibn=self._block_ibn(stage_ibn, i, blocks),
                    stride=blk_stride, has_downsample=has_ds,
                    num_groups=self.num_groups, dtype=self.dtype,
                    name=f"layer{s + 1}_{i}")(x, train, active)
                inplanes = planes * 4

        x = jnp.mean(x, axis=(1, 2))  # AvgPool2d(7) on 7x7 map
        return linear_torch_default(self.num_classes, dtype=self.dtype, name="fc")(x)


def resnet50_ibn_a(num_classes: int = 1000, **kw) -> ResNetIBN:
    """reference models/imagenet/resnet_ibn_cnsn.py:252-267 factory."""
    return ResNetIBN(layers=(3, 4, 6, 3), ibn_cfg=("a", "a", "a", None),
                     num_classes=num_classes, **kw)


def resnet50_ibn_b(num_classes: int = 1000, **kw) -> ResNetIBN:
    """reference models/imagenet/resnet_ibn_cnsn.py:297-313 factory."""
    return ResNetIBN(layers=(3, 4, 6, 3), ibn_cfg=("b", "b", None, None),
                     num_classes=num_classes, **kw)
