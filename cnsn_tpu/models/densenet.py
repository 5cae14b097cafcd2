"""DenseNet-40-12 (no bottleneck, reduction 1.0) with CNSN, NHWC / Flax.

Parity with the reference DenseNet
(reference: models/cifar/densenet_cnsn.py:13-244): single dense layers
(BN→ReLU→3x3 conv→concat) with CNSN at 'conv1_pre' or 'conv1_post'
(bottleneck variant adds 'conv2_post'); 3 dense blocks of 12 layers →
36 CNSN sites; transitions are BN→ReLU→1x1 conv→2x2 avg pool.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.cnsn import CNSN
from ..nn.norm import BatchNorm
from .common import conv_he_fanout, linear_torch_default

__all__ = ["DenseNet", "densenet"]


class DenseLayer(nn.Module):
    """Non-bottleneck dense layer (reference SingleLayerCustom)."""
    n_channels: int
    growth_rate: int
    pos: str
    cnsn_type: str
    crop: str
    beta: float
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        assert self.pos in ("conv1_pre", "conv1_post")
        ura = not train
        feats = self.n_channels if self.pos == "conv1_pre" else self.growth_rate
        cnsn = CNSN(features=feats, cnsn_type=self.cnsn_type, crop=self.crop,
                    beta=self.beta, num_groups=self.num_groups, name="cnsn")
        if self.pos == "conv1_pre":
            x = cnsn(x, active, ura)
        out = nn.relu(BatchNorm(self.n_channels, name="bn1")(x, ura))
        out = conv_he_fanout(self.growth_rate, 3, 1, dtype=self.dtype, name="conv1")(out)
        if self.pos == "conv1_post":
            out = cnsn(out, active, ura)
        return jnp.concatenate([x, out], axis=-1)


class BottleneckLayer(nn.Module):
    """Bottleneck dense layer (reference BottleneckCustom) — kept for the
    bottleneck=True variant's knob surface."""
    n_channels: int
    growth_rate: int
    pos: str
    cnsn_type: str
    crop: str
    beta: float
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        assert self.pos in ("conv1_pre", "conv1_post", "conv2_post")
        ura = not train
        inter = 4 * self.growth_rate
        feats = {"conv1_pre": self.n_channels, "conv1_post": inter,
                 "conv2_post": self.growth_rate}[self.pos]
        cnsn = CNSN(features=feats, cnsn_type=self.cnsn_type, crop=self.crop,
                    beta=self.beta, num_groups=self.num_groups, name="cnsn")
        if self.pos == "conv1_pre":
            x = cnsn(x, active, ura)
        out = nn.relu(BatchNorm(self.n_channels, name="bn1")(x, ura))
        out = conv_he_fanout(inter, 1, 1, padding=0, dtype=self.dtype, name="conv1")(out)
        if self.pos == "conv1_post":
            out = cnsn(out, active, ura)
        out = nn.relu(BatchNorm(inter, name="bn2")(out, ura))
        out = conv_he_fanout(self.growth_rate, 3, 1, dtype=self.dtype, name="conv2")(out)
        if self.pos == "conv2_post":
            out = cnsn(out, active, ura)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    growth_rate: int = 12
    depth: int = 40
    reduction: float = 1.0
    num_classes: int = 10
    bottleneck: bool = False
    pos: str = "conv1_pre"
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: str = "cnsn"
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32

    @property
    def layers_per_block(self) -> int:
        return int((self.depth - 4) / (6 if self.bottleneck else 3))

    @property
    def cn_num(self) -> int:
        return 3 * self.layers_per_block if "cn" in self.cnsn_type else 0

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None):
        ura = not train
        nd = self.layers_per_block
        layer_cls = BottleneckLayer if self.bottleneck else DenseLayer

        n_ch = 2 * self.growth_rate
        x = conv_he_fanout(n_ch, 3, 1, dtype=self.dtype, name="conv1")(x)
        site = 0
        for b in range(3):
            for i in range(nd):
                active = None if cn_active is None else cn_active[site]
                x = layer_cls(n_ch, self.growth_rate, pos=self.pos,
                              cnsn_type=self.cnsn_type, crop=self.crop,
                              beta=self.beta, num_groups=self.num_groups,
                              dtype=self.dtype,
                              name=f"dense{b + 1}_{i}")(x, train, active)
                n_ch += self.growth_rate
                site += 1
            if b < 2:
                n_out = int(math.floor(n_ch * self.reduction))
                x = nn.relu(BatchNorm(n_ch, name=f"trans{b + 1}_bn")(x, ura))
                x = conv_he_fanout(n_out, 1, 1, padding=0,
                                   dtype=self.dtype, name=f"trans{b + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                n_ch = n_out

        x = nn.relu(BatchNorm(n_ch, name="bn1")(x, ura))
        x = jnp.mean(x, axis=(1, 2))  # 8x8 avg pool on 8x8 map
        return linear_torch_default(self.num_classes, dtype=self.dtype, name="fc")(x)


def densenet(num_classes: int = 10, **kw) -> DenseNet:
    """reference models/cifar/densenet_cnsn.py:240-244 factory."""
    return DenseNet(growth_rate=12, depth=40, reduction=1.0,
                    num_classes=num_classes, bottleneck=False, **kw)
