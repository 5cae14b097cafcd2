"""PSPNet / PSANet segmentation heads on the dilated ResNet backbone.

Parity with the reference (segmentation/model/pspnet.py:8-107 PPM +
PSPNet; segmentation/model/psanet.py PSA/PSANet — a dead path in the
reference, selectable via ``arch:`` but never wired to CNSN): pyramid
pooling at bins (1,2,3,6), 512-wide classifier with dropout, aux head
on layer3, align_corners=True bilinear zoom (the reference uses
align_corners=True for these heads, unlike FCN).

Both heads reuse the CNSN-capable SegResNet backbone, so the CNSN knob
surface extends to PSP/PSA (a strict superset of the reference, which
left those heads unwired).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.common import he_fanout_normal
from ..nn.norm import BatchNorm
from .backbone import seg_resnet50

__all__ = ["PPM", "PSPNet", "PSA", "PSANet", "PSALite",
           "psa_mask_indices"]


def _resize_align_corners(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Bilinear with align_corners=True (torch F.interpolate semantics
    used by the PSP/PSA heads)."""
    n, h, w, c = x.shape
    H, W = hw
    if (h, w) == (H, W):
        return x
    rows = jnp.linspace(0.0, h - 1.0, H)
    cols = jnp.linspace(0.0, w - 1.0, W)
    r0 = jnp.clip(jnp.floor(rows).astype(jnp.int32), 0, h - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c0 = jnp.clip(jnp.floor(cols).astype(jnp.int32), 0, w - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)
    fr = (rows - r0).astype(x.dtype)[None, :, None, None]
    fc = (cols - c0).astype(x.dtype)[None, None, :, None]
    top = x[:, r0][:, :, c0] * (1 - fc) + x[:, r0][:, :, c1] * fc
    bot = x[:, r1][:, :, c0] * (1 - fc) + x[:, r1][:, :, c1] * fc
    return top * (1 - fr) + bot * fr


def _adaptive_avg_pool(x: jax.Array, bins: int) -> jax.Array:
    """AdaptiveAvgPool2d(bins) over NHWC (torch bin-boundary semantics)."""
    n, h, w, c = x.shape
    out = jnp.zeros((n, bins, bins, c), x.dtype)
    for i in range(bins):
        h0, h1 = (i * h) // bins, -(-((i + 1) * h) // bins)
        for j in range(bins):
            w0, w1 = (j * w) // bins, -(-((j + 1) * w) // bins)
            out = out.at[:, i, j].set(
                jnp.mean(x[:, h0:h1, w0:w1], axis=(1, 2)))
    return out


class PPM(nn.Module):
    """Pyramid Pooling Module (reference pspnet.py:8-26)."""
    reduction_dim: int
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        hw = x.shape[1:3]
        outs = [x]
        for bi, b in enumerate(self.bins):
            z = _adaptive_avg_pool(x, b)
            z = nn.Conv(self.reduction_dim, (1, 1), use_bias=False,
                        kernel_init=he_fanout_normal, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{bi}")(z)
            z = nn.relu(BatchNorm(self.reduction_dim,
                                  name=f"bn_{bi}")(z, not train))
            outs.append(_resize_align_corners(z, hw))
        return jnp.concatenate(outs, axis=-1)


class _ClsHead(nn.Module):
    width: int
    classes: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.width, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=he_fanout_normal,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.relu(BatchNorm(self.width, name="bn1")(x, not train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv2")(x)


class PSPNet(nn.Module):
    classes: int = 19
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    zoom_factor: int = 8
    use_ppm: bool = True
    block_idxs: str = ""
    pos: Optional[str] = None
    cn_pos: Optional[str] = None
    cnsn_type: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    num_groups: int = 1
    dtype: Any = None
    remat: Any = False  # bool or stage spec "1_2" (see SegResNet.remat)

    @property
    def cn_num(self) -> int:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).cn_num

    @property
    def has_img_cn(self) -> bool:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).has_img_cn

    # heads upsample with torch align_corners=True semantics — tells
    # SegStepFns which fused interpolation matrix to use (upsample.py)
    UPSAMPLE_ALIGN_CORNERS = True

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None,
                 upsample: bool = True):
        h = (x.shape[1] - 1) // 8 * self.zoom_factor + 1
        w = (x.shape[2] - 1) // 8 * self.zoom_factor + 1
        feats = seg_resnet50(
            block_idxs=self.block_idxs, pos=self.pos, cn_pos=self.cn_pos,
            cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
            num_groups=self.num_groups, dtype=self.dtype, remat=self.remat,
            dilation_mode="psp",
            name="backbone")(x, train, cn_active, img_cn_active)
        z = feats["out"]
        fea_dim = 2048
        if self.use_ppm:
            z = PPM(fea_dim // len(self.bins), tuple(self.bins),
                    dtype=self.dtype, name="ppm")(z, train)
        out = _ClsHead(512, self.classes, self.dropout, dtype=self.dtype,
                       name="cls")(z, train)
        aux = _ClsHead(256, self.classes, self.dropout, dtype=self.dtype,
                       name="aux")(feats["aux"], train)
        if upsample and self.zoom_factor != 1:
            out = _resize_align_corners(out.astype(jnp.float32), (h, w))
            aux = _resize_align_corners(aux.astype(jnp.float32), (h, w))
        return out.astype(jnp.float32), aux.astype(jnp.float32)


def psa_mask_indices(h: int, w: int, mask_h: int, mask_w: int) -> "np.ndarray":
    """Static index map for the reference's psa_mask CUDA op
    (segmentation/lib/psa, called at psanet.py:67,85-86).

    Returns idx of shape (h*w, h*w): idx[g, p] is the channel of the
    over-complete (mask_h*mask_w)-deep attention map at position p that
    lands on global position g, or the sentinel mask_h*mask_w when g is
    outside p's mask window (those entries read a zero-padded channel —
    torch zero-fills the buffer, and the zeros participate in the
    softmax, which this reproduces exactly).
    """
    import numpy as np
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    a, i = np.meshgrid(np.arange(h), np.arange(h), indexing="ij")
    dh = a - i + half_h                       # (h_global, h_pos)
    b, j = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    dw = b - j + half_w                       # (w_global, w_pos)
    ok = ((dh >= 0) & (dh < mask_h))[:, None, :, None] \
        & ((dw >= 0) & (dw < mask_w))[None, :, None, :]
    idx = dh[:, None, :, None] * mask_w + dw[None, :, None, :]
    idx = np.where(ok, idx, mask_h * mask_w)
    return idx.reshape(h * w, h * w).astype(np.int32)


class PSA(nn.Module):
    """Point-wise Spatial Attention module — full parity redesign of the
    reference PSA (segmentation/model/psanet.py:9-98).

    psa_type: 0=collect, 1=distribute, 2=bi-direction (both branches).
    The CUDA psa_mask scatter becomes one static gather
    (``psa_mask_indices`` + take_along_axis); the (h*w, h*w) attention
    bmm maps onto the MXU as a batched einsum.
    """

    in_channels: int = 2048
    mid_channels: int = 512
    psa_type: int = 2
    compact: bool = False
    shrink_factor: int = 2
    mask_h: int = 0        # 0 → auto: 2*((shrunk h)-1)+1, i.e. 2h-1
    mask_w: int = 0
    normalization_factor: float = 1.0
    psa_softmax: bool = True
    dtype: Any = None

    def _reduce(self, x, train, name):
        x = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    kernel_init=he_fanout_normal, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_conv")(x)
        return nn.relu(BatchNorm(self.mid_channels,
                                 name=f"{name}_bn")(x, not train))

    def _attention(self, x, train, mask_hw, name):
        x = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    kernel_init=he_fanout_normal, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_conv1")(x)
        x = nn.relu(BatchNorm(self.mid_channels,
                              name=f"{name}_bn")(x, not train))
        return nn.Conv(mask_hw, (1, 1), use_bias=False,
                       kernel_init=he_fanout_normal, dtype=self.dtype,
                       param_dtype=jnp.float32, name=f"{name}_conv2")(x)

    def _expand(self, y, idx):
        """(n, h, w, M) over-complete map → (n, h*w, h*w) attention in
        collect orientation (global axis first)."""
        n, h, w, m = y.shape
        yp = jnp.concatenate(
            [y.reshape(n, h * w, m).transpose(0, 2, 1),
             jnp.zeros((n, 1, h * w), y.dtype)], axis=1)  # (n, M+1, P)
        return jnp.take_along_axis(yp, idx[None], axis=1)  # (n, G, P)

    def _branch(self, feat, attn_raw, idx, distribute: bool):
        n, h, w, c = feat.shape
        if self.compact:
            a = attn_raw.reshape(n, h * w, h * w).transpose(0, 2, 1)
        else:
            a = self._expand(attn_raw, idx)
        if distribute:
            a = a.transpose(0, 2, 1)
        if self.psa_softmax:
            a = jax.nn.softmax(a.astype(jnp.float32), axis=1)
        out = jnp.einsum("nqc,nqp->npc",
                         feat.reshape(n, h * w, c).astype(jnp.float32),
                         a.astype(jnp.float32))
        return (out / self.normalization_factor).reshape(
            n, h, w, c).astype(feat.dtype)

    @nn.compact
    def __call__(self, x, train: bool):
        fh, fw = x.shape[1:3]
        out = x
        sf = self.shrink_factor
        h = (fh - 1) // sf + 1
        w = (fw - 1) // sf + 1
        assert (fh - 1) % sf == 0 and (fw - 1) % sf == 0, (
            "feature size must satisfy (size-1) % shrink_factor == 0 "
            "(same constraint as the reference's F.interpolate round-trip)")
        mask_h = self.mask_h or 2 * h - 1
        mask_w = self.mask_w or 2 * w - 1
        mask_hw = h * w if self.compact else mask_h * mask_w
        idx = None
        if not self.compact:
            idx = jnp.asarray(psa_mask_indices(h, w, mask_h, mask_w))

        if self.psa_type in (0, 1):
            z = self._reduce(x, train, "reduce")
            if sf != 1:
                z = _resize_align_corners(z, (h, w))
            y = self._attention(z, train, mask_hw, "attention")
            z = self._branch(z, y, idx, distribute=(self.psa_type == 1))
        else:
            z_col = self._reduce(x, train, "reduce")
            z_dis = self._reduce(x, train, "reduce_p")
            if sf != 1:
                z_col = _resize_align_corners(z_col, (h, w))
                z_dis = _resize_align_corners(z_dis, (h, w))
            y_col = self._attention(z_col, train, mask_hw, "attention")
            y_dis = self._attention(z_dis, train, mask_hw, "attention_p")
            z = jnp.concatenate(
                [self._branch(z_col, y_col, idx, distribute=False),
                 self._branch(z_dis, y_dis, idx, distribute=True)], axis=-1)

        z = nn.Conv(self.in_channels, (1, 1), use_bias=False,
                    kernel_init=he_fanout_normal, dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj_conv")(z)
        z = nn.relu(BatchNorm(self.in_channels, name="proj_bn")(z, not train))
        if sf != 1:
            z = _resize_align_corners(z, (fh, fw))
        return jnp.concatenate([out, z], axis=-1)


class PSANet(nn.Module):
    """Point-wise Spatial Attention network (reference
    psanet.py:101-179), on the CNSN-capable dilated backbone: PSA
    module on layer4, 4096-wide cls head, aux head on layer3.  A dead
    path in the reference (its layer0 contract never matched
    model/resnet.py) — functional here, with the reference's intended
    semantics."""

    classes: int = 19
    psa_type: int = 2
    compact: bool = False
    shrink_factor: int = 2
    mask_h: int = 0
    mask_w: int = 0
    normalization_factor: float = 1.0
    psa_softmax: bool = True
    dropout: float = 0.1
    zoom_factor: int = 8
    block_idxs: str = ""
    pos: Optional[str] = None
    cn_pos: Optional[str] = None
    cnsn_type: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    num_groups: int = 1
    dtype: Any = None
    remat: Any = False  # bool or stage spec "1_2" (see SegResNet.remat)

    @property
    def cn_num(self) -> int:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).cn_num

    @property
    def has_img_cn(self) -> bool:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).has_img_cn

    UPSAMPLE_ALIGN_CORNERS = True

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None,
                 upsample: bool = True):
        h = (x.shape[1] - 1) // 8 * self.zoom_factor + 1
        w = (x.shape[2] - 1) // 8 * self.zoom_factor + 1
        feats = seg_resnet50(
            block_idxs=self.block_idxs, pos=self.pos, cn_pos=self.cn_pos,
            cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
            num_groups=self.num_groups, dtype=self.dtype, remat=self.remat,
            dilation_mode="psp",
            name="backbone")(x, train, cn_active, img_cn_active)
        z = PSA(in_channels=2048, mid_channels=512, psa_type=self.psa_type,
                compact=self.compact, shrink_factor=self.shrink_factor,
                mask_h=self.mask_h, mask_w=self.mask_w,
                normalization_factor=self.normalization_factor,
                psa_softmax=self.psa_softmax, dtype=self.dtype,
                name="psa")(feats["out"], train)
        out = _ClsHead(512, self.classes, self.dropout, dtype=self.dtype,
                       name="cls")(z, train)
        aux = _ClsHead(256, self.classes, self.dropout, dtype=self.dtype,
                       name="aux")(feats["aux"], train)
        if upsample and self.zoom_factor != 1:
            out = _resize_align_corners(out.astype(jnp.float32), (h, w))
            aux = _resize_align_corners(aux.astype(jnp.float32), (h, w))
        return out.astype(jnp.float32), aux.astype(jnp.float32)


class PSALite(nn.Module):
    """Compact PSA variant (not in the reference): learned per-position
    attention over a pooled spatial grid instead of the full point-wise
    map — O(P·G_pool) instead of O(P²) memory."""

    classes: int = 19
    psa_dim: int = 512
    pool_hw: int = 15
    dropout: float = 0.1
    zoom_factor: int = 8
    block_idxs: str = ""
    pos: Optional[str] = None
    cn_pos: Optional[str] = None
    cnsn_type: Optional[str] = None
    crop: str = "neither"
    beta: float = 1.0
    num_groups: int = 1
    dtype: Any = None
    remat: Any = False  # bool or stage spec "1_2" (see SegResNet.remat)

    @property
    def cn_num(self) -> int:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).cn_num

    @property
    def has_img_cn(self) -> bool:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).has_img_cn

    UPSAMPLE_ALIGN_CORNERS = True

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None,
                 upsample: bool = True):
        h = (x.shape[1] - 1) // 8 * self.zoom_factor + 1
        w = (x.shape[2] - 1) // 8 * self.zoom_factor + 1
        feats = seg_resnet50(
            block_idxs=self.block_idxs, pos=self.pos, cn_pos=self.cn_pos,
            cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
            num_groups=self.num_groups, dtype=self.dtype, remat=self.remat,
            dilation_mode="psp",
            name="backbone")(x, train, cn_active, img_cn_active)
        z = feats["out"]
        n, fh, fw, _ = z.shape

        # reduce → attention over a pooled grid → aggregate (collect)
        v = nn.Conv(self.psa_dim, (1, 1), use_bias=False,
                    kernel_init=he_fanout_normal, dtype=self.dtype,
                    param_dtype=jnp.float32, name="psa_reduce")(z)
        v = nn.relu(BatchNorm(self.psa_dim, name="psa_bn")(v, not train))
        grid = _adaptive_avg_pool(v, min(self.pool_hw, fh))
        gh, gw = grid.shape[1:3]
        attn = nn.Conv(gh * gw, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="psa_attn")(v)
        attn = jax.nn.softmax(attn.reshape(n, fh * fw, gh * gw), axis=-1)
        agg = jnp.einsum("npg,ngc->npc", attn.astype(jnp.float32),
                         grid.reshape(n, gh * gw, -1).astype(jnp.float32))
        agg = agg.reshape(n, fh, fw, -1).astype(z.dtype)
        z = jnp.concatenate([z, agg], axis=-1)

        out = _ClsHead(512, self.classes, self.dropout, dtype=self.dtype,
                       name="cls")(z, train)
        aux = _ClsHead(256, self.classes, self.dropout, dtype=self.dtype,
                       name="aux")(feats["aux"], train)
        if upsample and self.zoom_factor != 1:
            out = _resize_align_corners(out.astype(jnp.float32), (h, w))
            aux = _resize_align_corners(aux.astype(jnp.float32), (h, w))
        return out.astype(jnp.float32), aux.astype(jnp.float32)
