"""WideResNet-40-2 with CNSN insertion, NHWC / Flax.

Architecture parity with the reference CIFAR WideResNet
(reference: models/cifar/wideresnet_cnsn.py:12-227): pre-activation
basic blocks, CNSN at one of {residual, identity, pre, post} per block,
`pre` with unequal in/out channels sizes the SelfNorm to ``in_planes``.
He(fan_out) conv init, BN weight=1/bias=0, zeroed classifier bias.

cn site count: 18 blocks (depth 40 → 6 per group × 3 groups).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.cnsn import CNSN
from ..nn.norm import BatchNorm
from .common import conv_he_fanout, linear_torch_default

__all__ = ["WideResNet"]


class BasicBlock(nn.Module):
    in_planes: int
    out_planes: int
    stride: int
    pos: str
    cnsn_type: str
    crop: str
    beta: float
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        ura = not train
        equal = self.in_planes == self.out_planes
        assert self.pos in ("residual", "identity", "pre", "post")
        sn_feats = (self.in_planes
                    if self.pos == "pre" and not equal else self.out_planes)
        cnsn = CNSN(features=sn_feats, cnsn_type=self.cnsn_type, crop=self.crop,
                    beta=self.beta, num_groups=self.num_groups, name="cnsn")

        if not equal:
            x = nn.relu(BatchNorm(self.in_planes, name="bn1")(x, ura))

        out = cnsn(x, active, ura) if self.pos == "pre" else x

        if equal:
            out = nn.relu(BatchNorm(self.in_planes, name="bn1")(out, ura))

        out = conv_he_fanout(self.out_planes, 3, self.stride, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(BatchNorm(self.out_planes, name="bn2")(out, ura))
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = conv_he_fanout(self.out_planes, 3, 1, dtype=self.dtype, name="conv2")(out)

        if not equal:
            x = conv_he_fanout(self.out_planes, 1, self.stride, padding=0,
                               dtype=self.dtype, name="conv_shortcut")(x)

        if self.pos == "residual":
            out = cnsn(out, active, ura)
        elif self.pos == "identity":
            x = cnsn(x, active, ura)

        out = x + out
        if self.pos == "post":
            out = cnsn(out, active, ura)
        return out


class WideResNet(nn.Module):
    depth: int = 40
    num_classes: int = 10
    widen_factor: int = 2
    drop_rate: float = 0.0
    pos: str = "residual"
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: str = "cnsn"
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32

    @property
    def cn_num(self) -> int:
        assert (self.depth - 4) % 6 == 0
        return 3 * ((self.depth - 4) // 6) if "cn" in self.cnsn_type else 0

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None):
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        k = self.widen_factor
        chans = [16, 16 * k, 32 * k, 64 * k]
        ura = not train

        out = conv_he_fanout(chans[0], 3, 1, dtype=self.dtype, name="conv1")(x)
        site = 0
        for g in range(3):
            for i in range(n):
                in_p = chans[g] if i == 0 else chans[g + 1]
                stride = (1 if g == 0 else 2) if i == 0 else 1
                active = None if cn_active is None else cn_active[site]
                out = BasicBlock(
                    in_p, chans[g + 1], stride, pos=self.pos,
                    cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
                    num_groups=self.num_groups, dtype=self.dtype,
                    drop_rate=self.drop_rate,
                    name=f"block{g + 1}_{i}")(out, train, active)
                site += 1

        out = nn.relu(BatchNorm(chans[3], name="bn1")(out, ura))
        out = jnp.mean(out, axis=(1, 2))  # global pool (reference: 8x8 avg on 8x8)
        out = linear_torch_default(self.num_classes, dtype=self.dtype, name="fc")(out)
        return out
