"""Segmentation backbone: dilated ResNet-50 with stage-selectable CNSN.

Parity with the reference segmentation backbone
(reference: segmentation/model/cnsn_resnet.py:215-472):

  * v1.5 bottlenecks; ``replace_stride_with_dilation=[False, True,
    True]`` → output stride 8, layer3 dilation 2, layer4 dilation 4;
  * ``block_idxs`` ('1_2_3_4') selects which stages get CNSN blocks;
    ``0`` adds an image-level CrossNorm before the stem (``img_cn``),
    which activates on *every* aug forward (cnsn_resnet.py:439-451);
  * ``cn_pos`` places a *separate* CrossNorm (the reference's
    ``real_cn``) at 'post', decoupled from the SN position ``pos``;
    when ``cn_pos`` is set the CNSN slot carries SN only;
  * returns {'out': layer4, 'aux': layer3} features.

The reference's latent bugs (SURVEY §2.6: 'identity' applying cnsn to
``out``, BasicBlock pre/identity using undefined names) are fixed here,
not replicated — the shipped gtav config (pos=residual, cn_pos=post)
never takes those branches.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import he_fanout_normal
from ..nn.cnsn import CNSN, CrossNorm
from ..nn.norm import BatchNorm

__all__ = ["SegResNet", "seg_resnet50"]


def _conv(features, kernel, stride=1, dilation=1, dtype=None, name=None):
    pad = dilation * (kernel // 2)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation), use_bias=False,
                   kernel_init=he_fanout_normal, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class SegBottleneck(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    custom: bool = False
    pos: Optional[str] = None       # CNSN (SN) site
    cn_pos: Optional[str] = None    # separate CrossNorm site ('post')
    cnsn_type: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    num_groups: int = 1
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool, active: Optional[jax.Array]):
        ura = not train
        out_ch = self.planes * self.expansion

        cnsn = real_cn = None
        if self.custom:
            assert self.cnsn_type in ("sn", "cn", "cnsn")
            assert self.pos in ("residual", "identity", "pre", "post")
            if self.cn_pos is not None:
                # decoupled sites: CrossNorm at cn_pos (the reference's
                # ``real_cn``), SN (if any) at pos via the CNSN slot
                if "cn" in self.cnsn_type:
                    real_cn = CrossNorm(crop=self.crop, beta=self.beta,
                                        num_groups=self.num_groups,
                                        name="real_cn")
                slot_type = "sn" if "sn" in self.cnsn_type else None
            else:
                slot_type = self.cnsn_type
            if slot_type is not None:
                sn_feats = (self.inplanes
                            if self.pos == "pre" and not self.has_downsample
                            else out_ch)
                cnsn = CNSN(features=sn_feats, cnsn_type=slot_type,
                            crop=self.crop, beta=self.beta,
                            num_groups=self.num_groups, name="cnsn")

        identity = x
        out = x
        if cnsn is not None and self.pos == "pre":
            out = cnsn(out, active, ura)

        out = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(BatchNorm(self.planes, name="bn1")(out, ura))
        out = _conv(self.planes, 3, self.stride, self.dilation,
                    dtype=self.dtype, name="conv2")(out)
        out = nn.relu(BatchNorm(self.planes, name="bn2")(out, ura))
        out = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(out_ch, name="bn3")(out, ura)

        if self.has_downsample:
            identity = _conv(out_ch, 1, self.stride, dtype=self.dtype,
                             name="downsample_conv")(x)
            identity = BatchNorm(out_ch, name="downsample_bn")(identity, ura)

        if cnsn is not None:
            if self.pos == "residual":
                out = cnsn(out, active, ura)
            elif self.pos == "identity":
                identity = cnsn(identity, active, ura)

        out = out + identity
        out = nn.relu(out)

        if cnsn is not None and self.pos == "post":
            out = cnsn(out, active, ura)
        if real_cn is not None and self.cn_pos == "post":
            out = real_cn(out, active)
        return out


class SegResNet(nn.Module):
    """Dilated CNSN ResNet; __call__ returns {'out', 'aux'}."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block_idxs: str = "1_2_3_4"
    pos: Optional[str] = "residual"
    cn_pos: Optional[str] = "post"
    cnsn_type: Optional[str] = "cnsn"
    crop: str = "style"
    beta: float = 1.0
    num_groups: int = 1
    dtype: Any = None
    # True/False or a stage spec '1_2' — rematerialize bottlenecks of
    # the listed stages only (selective remat: early stages carry the
    # big 179²/90²×C activations; late stages are cheap to store but
    # expensive to recompute)
    remat: Any = False
    # 'torchvision': first block of a dilated stage keeps the previous
    # dilation (cnsn_resnet.py semantics — the FCN trunks).  'psp': ALL
    # 3x3s of a dilated stage get the full dilation — the reference
    # PSP/PSA trunks patch every conv2 in layer3/4 to (2,2)/(4,4)
    # after construction (pspnet.py:50-60, psanet.py:123-131).
    dilation_mode: str = "torchvision"

    @property
    def remat_stages(self):
        # YAML/CLI coercion: an unquoted `remat: 1_2` parses as the INT
        # 12, and `remat: 34` likewise — normalize non-bool ints to
        # their digit set so the documented stage spec survives
        # yaml.safe_load (bool True still means all stages)
        if isinstance(self.remat, int) and not isinstance(self.remat, bool):
            return {int(c) for c in str(self.remat)}
        if isinstance(self.remat, str):
            return {int(v) for v in self.remat.split("_") if v}
        return {1, 2, 3, 4} if self.remat else set()

    @property
    def idxs(self):
        return [int(v) for v in str(self.block_idxs).split("_")] \
            if self.block_idxs else []

    @property
    def has_img_cn(self) -> bool:
        return 0 in self.idxs and self.cnsn_type and "cn" in self.cnsn_type

    @property
    def cn_num(self) -> int:
        """In-network CrossNorm sites (img_cn is gated separately —
        the reference activates it on every aug forward)."""
        if not self.cnsn_type or "cn" not in self.cnsn_type:
            return 0
        return sum(b for i, b in zip((1, 2, 3, 4), self.layers)
                   if i in self.idxs)

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None):
        ura = not train
        if self.has_img_cn:
            x = CrossNorm(crop=self.crop, beta=self.beta,
                          num_groups=self.num_groups,
                          name="img_cn")(x, img_cn_active)

        x = _conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm(64, name="bn1")(x, ura))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        remat_cls = nn.remat(SegBottleneck, static_argnums=(2,))
        dilations = (1, 1, 2, 4)      # replace_stride_with_dilation=[F,T,T]
        strides = (1, 2, 1, 1)
        inplanes, site = 64, 0
        aux = None
        for s, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                 self.layers)):
            custom = (s + 1) in self.idxs and self.cnsn_type is not None
            for i in range(blocks):
                blk_stride = strides[s] if i == 0 else 1
                has_ds = (i == 0) and (strides[s] != 1
                                       or inplanes != planes * 4)
                # first block of a dilated stage uses the previous
                # dilation on its 3x3 (torchvision semantics); 'psp'
                # mode dilates every block fully (pspnet.py:50-60)
                dil = (dilations[s - 1] if (i == 0 and s > 0
                                            and dilations[s] > 1
                                            and self.dilation_mode
                                                != "psp")
                       else dilations[s])
                active = None
                if custom and "cn" in (self.cnsn_type or ""):
                    if cn_active is not None:
                        active = cn_active[site]
                    site += 1
                cls = (remat_cls if (s + 1) in self.remat_stages
                       else SegBottleneck)
                x = cls(
                    inplanes, planes, stride=blk_stride, dilation=dil,
                    has_downsample=has_ds, custom=custom, pos=self.pos,
                    cn_pos=self.cn_pos, cnsn_type=self.cnsn_type,
                    crop=self.crop, beta=self.beta,
                    num_groups=self.num_groups, dtype=self.dtype,
                    name=f"layer{s + 1}_{i}")(x, train, active)
                inplanes = planes * 4
            if s == 2:
                aux = x
        return {"out": x, "aux": aux}


def seg_resnet50(**kw) -> SegResNet:
    """reference segmentation/model/cnsn_resnet.py:509-517 factory."""
    return SegResNet(layers=(3, 4, 6, 3), **kw)
