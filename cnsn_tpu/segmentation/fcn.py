"""FCN segmentation heads + the FCN-CNSN model.

Parity with the reference (segmentation/model/fcn.py:82-126 FCN_CNSN;
torchvision FCNHead): head = 3x3 conv (C→C/4, no bias) → BN → ReLU →
Dropout(0.1) → 1x1 conv (C/4→classes); main head on layer4 (2048), aux
on layer3 (1024); logits bilinearly upsampled to the input size
(align_corners=False ≡ jax.image.resize 'bilinear').

The reference's ``aug`` kwarg bug (fcn.py:107-110 references an
undefined name) is fixed: aug state arrives as explicit cn masks.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import he_fanout_normal
from ..nn.norm import BatchNorm
from .backbone import SegResNet, seg_resnet50

__all__ = ["FCNHead", "FCNCNSN", "fcn_cnsn", "fcn_baseline"]


class FCNHead(nn.Module):
    in_channels: int
    classes: int
    dropout: float = 0.1   # torchvision FCNHead fixes 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        inter = self.in_channels // 4
        x = nn.Conv(inter, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=he_fanout_normal, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(BatchNorm(inter, name="bn1")(x, not train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv2")(x)


class FCNCNSN(nn.Module):
    """FCN-ResNet50 with CNSN backbone.  Returns (out, aux) logits at
    input resolution."""

    classes: int = 19
    block_idxs: str = "1_2_3_4"
    pos: Optional[str] = "residual"
    cn_pos: Optional[str] = "post"
    cnsn_type: Optional[str] = "cnsn"
    crop: str = "style"
    beta: float = 1.0
    num_groups: int = 1
    dropout: float = 0.1
    dtype: Any = None
    remat: Any = False  # bool or stage spec "1_2" (see SegResNet.remat)

    @property
    def backbone_def(self) -> SegResNet:
        return seg_resnet50(block_idxs=self.block_idxs, pos=self.pos,
                            cn_pos=self.cn_pos, cnsn_type=self.cnsn_type,
                            crop=self.crop, beta=self.beta,
                            num_groups=self.num_groups, dtype=self.dtype,
                            remat=self.remat)

    @property
    def cn_num(self) -> int:
        return self.backbone_def.cn_num

    @property
    def has_img_cn(self) -> bool:
        return self.backbone_def.has_img_cn

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None,
                 upsample: bool = True):
        """``upsample=False`` returns the raw OS8 head logits — the
        step then fuses upsample+CE in a class-major layout
        (segmentation/upsample.py) instead of materializing the
        lane-padded (B, H, W, 19) tensor."""
        in_hw = x.shape[1:3]
        feats = seg_resnet50(
            block_idxs=self.block_idxs, pos=self.pos, cn_pos=self.cn_pos,
            cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
            num_groups=self.num_groups, dtype=self.dtype, remat=self.remat,
            name="backbone")(x, train, cn_active, img_cn_active)
        out = FCNHead(2048, self.classes, self.dropout, dtype=self.dtype,
                      name="classifier")(feats["out"], train)
        aux = FCNHead(1024, self.classes, self.dropout, dtype=self.dtype,
                      name="aux_classifier")(feats["aux"], train)

        if not upsample:
            return out, aux

        def up(z):
            return jax.image.resize(
                z.astype(jnp.float32),
                (z.shape[0], in_hw[0], in_hw[1], z.shape[3]), "bilinear")

        return up(out), up(aux)


def fcn_cnsn(classes: int, **kw) -> FCNCNSN:
    return FCNCNSN(classes=classes, **kw)


def fcn_baseline(classes: int, **kw) -> FCNCNSN:
    """Plain FCN-ResNet50 (reference FCNet, segmentation/model/fcn.py:15-53):
    same topology with no CNSN modules."""
    return FCNCNSN(classes=classes, cnsn_type=None, block_idxs="",
                   pos=None, cn_pos=None, **kw)
