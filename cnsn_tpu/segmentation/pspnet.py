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

__all__ = ["PPM", "PSPNet", "PSANet"]


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
    remat: bool = False

    @property
    def cn_num(self) -> int:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).cn_num

    @property
    def has_img_cn(self) -> bool:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).has_img_cn

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None):
        h = (x.shape[1] - 1) // 8 * self.zoom_factor + 1
        w = (x.shape[2] - 1) // 8 * self.zoom_factor + 1
        feats = seg_resnet50(
            block_idxs=self.block_idxs, pos=self.pos, cn_pos=self.cn_pos,
            cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
            num_groups=self.num_groups, dtype=self.dtype, remat=self.remat,
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
        if self.zoom_factor != 1:
            out = _resize_align_corners(out.astype(jnp.float32), (h, w))
            aux = _resize_align_corners(aux.astype(jnp.float32), (h, w))
        return out.astype(jnp.float32), aux.astype(jnp.float32)


class PSANet(nn.Module):
    """Point-wise Spatial Attention head (reference psanet.py:101-160 —
    a dead path there; implemented here in its 'collect' form with a
    learned per-position attention over a pooled spatial grid)."""

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
    remat: bool = False

    @property
    def cn_num(self) -> int:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).cn_num

    @property
    def has_img_cn(self) -> bool:
        return seg_resnet50(block_idxs=self.block_idxs,
                            cnsn_type=self.cnsn_type).has_img_cn

    @nn.compact
    def __call__(self, x, train: bool = False,
                 cn_active: Optional[jax.Array] = None,
                 img_cn_active: Optional[jax.Array] = None):
        h = (x.shape[1] - 1) // 8 * self.zoom_factor + 1
        w = (x.shape[2] - 1) // 8 * self.zoom_factor + 1
        feats = seg_resnet50(
            block_idxs=self.block_idxs, pos=self.pos, cn_pos=self.cn_pos,
            cnsn_type=self.cnsn_type, crop=self.crop, beta=self.beta,
            num_groups=self.num_groups, dtype=self.dtype, remat=self.remat,
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
        if self.zoom_factor != 1:
            out = _resize_align_corners(out.astype(jnp.float32), (h, w))
            aux = _resize_align_corners(aux.astype(jnp.float32), (h, w))
        return out.astype(jnp.float32), aux.astype(jnp.float32)
