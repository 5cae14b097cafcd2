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

__all__ = ["ResNet", "ResNetStage", "block_plan", "resnet50"]


def block_plan(layers: Sequence[int]):
    """Static per-bottleneck construction plan shared by ``ResNet`` and
    ``ResNetStage`` — one source of truth so a staged apply creates
    submodules with byte-identical names/shapes to the monolithic
    model (reference block layout: models/imagenet/resnet_cnsn.py
    _make_layer calls at :229-244)."""
    plan = []
    inplanes = 64
    for s, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
        stride = 1 if s == 0 else 2
        for i in range(blocks):
            blk_stride = stride if i == 0 else 1
            has_ds = (i == 0) and (blk_stride != 1 or inplanes != planes * 4)
            plan.append(dict(name=f"layer{s + 1}_{i}", inplanes=inplanes,
                             planes=planes, stride=blk_stride,
                             has_downsample=has_ds))
            inplanes = planes * 4
    return plan


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
        for site, blk in enumerate(block_plan(self.layers)):
            active = None if cn_active is None else cn_active[site]
            x = block_cls(
                blk["inplanes"], blk["planes"], pos=self.pos,
                cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
                stride=blk["stride"], has_downsample=blk["has_downsample"],
                groups=self.groups, base_width=self.width_per_group,
                num_groups=self.num_groups, dtype=self.dtype,
                name=blk["name"])(x, train, active)

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        return linear_torch_default(self.num_classes, dtype=self.dtype, name="fc")(x)


class ResNetStage(nn.Module):
    """Eval-forward slice of a ``ResNet``: bottlenecks ``[start, stop)``
    of the SAME param tree (stem included when start == 0, pool + fc
    when stop == total), applied with the monolithic model's variables
    (flax ignores unused subtrees).  This is the stage unit for
    pipeline-parallel serving (parallel/pipeline.py::pipeline_stages):
    at eval, BN reads frozen running stats and CrossNorm is inactive,
    so every per-sample computation is microbatch-invariant and the
    pipelined forward equals the sequential one exactly
    (tests/test_pipeline.py).  Submodule construction goes through the
    shared ``block_plan`` so names/shapes are byte-identical to
    ``ResNet.__call__``."""
    start: int
    stop: int
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    pos: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: Optional[str] = None
    num_groups: int = 1
    dtype: Any = None
    stem: str = os.environ.get("CNSN_STEM", "s2d")

    @classmethod
    def from_model(cls, model: "ResNet", start: int, stop: int):
        return cls(start=start, stop=stop, layers=model.layers,
                   num_classes=model.num_classes, groups=model.groups,
                   width_per_group=model.width_per_group, pos=model.pos,
                   crop=model.crop, beta=model.beta,
                   cnsn_type=model.cnsn_type, num_groups=model.num_groups,
                   dtype=model.dtype, stem=model.stem)

    @nn.compact
    def __call__(self, x):
        plan = block_plan(self.layers)
        assert 0 <= self.start < self.stop <= len(plan)
        if self.start == 0:
            if self.stem == "s2d":
                x = S2DStem(64, dtype=self.dtype, name="conv1")(x)
            else:
                x = conv_he_fanout(64, 7, 2, padding=3, dtype=self.dtype,
                                   name="conv1")(x)
            x = nn.relu(BatchNorm(64, name="bn1")(x, True))
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        for blk in plan[self.start:self.stop]:
            x = Bottleneck(
                blk["inplanes"], blk["planes"], pos=self.pos,
                cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
                stride=blk["stride"], has_downsample=blk["has_downsample"],
                groups=self.groups, base_width=self.width_per_group,
                num_groups=self.num_groups, dtype=self.dtype,
                name=blk["name"])(x, False, None)
        if self.stop == len(plan):
            x = jnp.mean(x, axis=(1, 2))
            x = linear_torch_default(self.num_classes, dtype=self.dtype,
                                     name="fc")(x)
        return x


def resnet50(num_classes: int = 1000, **kw) -> ResNet:
    """reference models/imagenet/resnet_cnsn.py:309-323 factory."""
    return ResNet(layers=(3, 4, 6, 3), num_classes=num_classes, **kw)
