"""AllConvNet with CNSN insertion, NHWC / Flax.

Parity with the reference AllConvNet
(reference: models/cifar/allconv_cnsn.py:18-163): layer config
[96,96,96,'Md',192,192,192,'Md','nopad','NIN','NIN','A']; integer
``pos`` in {1,2,3} splices the CNSN into [conv, BN, GELU] at that index;
GELU is the sigmoid approximation; the 'NIN' layers are the reference's
odd k=1 convs **with padding=1** (spatial dims grow by 2); 'A' is an
8x8/8 avg pool in floor mode.  9 CNSN sites.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.cnsn import CNSN
from ..nn.norm import BatchNorm, gelu_sig
from .common import linear_torch_default, he_fanout_normal

__all__ = ["AllConvNet"]

CFG = (96, 96, 96, "Md", 192, 192, 192, "Md", "nopad", "NIN", "NIN", "A")


class AllConvNet(nn.Module):
    num_classes: int = 10
    pos: int = 1  # index in [conv, BN, GELU] where CNSN is spliced
    crop: str = "neither"
    beta: float = 1.0
    cnsn_type: str = "cn"
    num_groups: int = 1
    dtype: Any = None  # compute dtype (bf16 fast path); params stay fp32
    # reference hardcodes Dropout(p=0.5) after each maxpool
    # (models/cifar/allconv_cnsn.py:29); exposed so deterministic
    # harnesses (tests/test_convergence.py) can run at 0.0
    drop_rate: float = 0.5

    @property
    def cn_num(self) -> int:
        return 9 if "cn" in self.cnsn_type else 0

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None):
        pos = int(self.pos)
        assert pos in (1, 2, 3)
        ura = not train
        in_ch = 3
        site = 0
        for li, v in enumerate(CFG):
            if v == "Md":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
                continue
            if v == "A":
                x = nn.avg_pool(x, (8, 8), strides=(8, 8))
                continue
            if v == "NIN":
                kernel, padding, out_ch = 1, 1, in_ch
            elif v == "nopad":
                kernel, padding, out_ch = 3, 0, in_ch
            else:
                kernel, padding, out_ch = 3, 1, int(v)

            cnsn = CNSN(features=out_ch,
                        cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
                        num_groups=self.num_groups, name=f"cnsn_{li}")
            active = None if cn_active is None else cn_active[site]
            site += 1

            # conv has bias=True in the reference AllConvNet (torch default),
            # with He-normal weight and torch-default bias.
            x = nn.Conv(out_ch, (kernel, kernel), strides=(1, 1),
                        padding=((padding, padding), (padding, padding)),
                        use_bias=True, kernel_init=he_fanout_normal,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv_{li}")(x)
            if pos == 1:
                x = cnsn(x, active, ura)
            x = BatchNorm(out_ch, name=f"bn_{li}")(x, ura)
            if pos == 2:
                x = cnsn(x, active, ura)
            x = gelu_sig(x)
            if pos == 3:
                x = cnsn(x, active, ura)
            in_ch = out_ch

        x = x.reshape(x.shape[0], -1)
        return linear_torch_default(self.num_classes, dtype=self.dtype, name="classifier")(x)
