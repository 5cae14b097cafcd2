"""Shared model-building helpers: torch-parity initializers and conv/linear
constructors (NHWC, bias-free convs as in the reference models)."""
from __future__ import annotations

import os
from typing import Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "he_fanout_normal", "torch_linear_uniform", "kaiming_normal_fanin",
    "conv_he_fanout", "linear_torch_default", "linear_kaiming_normal",
    "S2DStem",
]

# He-normal with fan_out = k*k*out_channels: the explicit init used by every
# reference model (e.g. models/cifar/wideresnet_cnsn.py:179-182).
he_fanout_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# kaiming_normal_(fan_in, relu): used for the ResNeXt classifier
# (models/cifar/resnext_cnsn.py:173).
kaiming_normal_fanin = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_linear_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5))
    → U(±1/sqrt(fan_in)).  Flax kernels are (in, out); fan_in = shape[0]."""
    bound = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv1x1Dot(nn.Module):
    """1x1/stride-1 conv computed as a dot_general over the channel
    axis.  Mathematically identical to nn.Conv (same (1,1,Cin,Cout)
    param under ``kernel``), but the backward pass lowers to plain
    matmuls instead of conv_general_dilated gradients — the profiled
    step spends 54% of its time in conv backward, with the pointwise
    convs' wgrad at ~11% MXU utilization (perf trace r2)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        k = self.param("kernel", he_fanout_normal,
                       (1, 1, c, self.features), jnp.float32)
        # dtype=None matches nn.Conv's promotion: bf16 x + fp32 kernel
        # computes (and returns) fp32
        dt = self.dtype or jnp.promote_types(x.dtype, k.dtype)
        return jax.lax.dot_general(
            x.astype(dt), k[0, 0].astype(dt),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))


class ConvCustomBwd(nn.Module):
    """k×k conv (forward = stock conv_general_dilated, same ``kernel``
    param tree as nn.Conv) with hand-lowered gradients — wgrad as
    tap-wise dot_generals and/or stride-1 dgrad as a flipped forward
    conv (ops/convdot.py).  Exists to attack the conv-backward 54% of
    the flagship step."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 1
    wgrad: str = "dot"
    dgrad: str = "dot"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.convdot import conv2d_custom_bwd
        c = x.shape[-1]
        k = self.param("kernel", he_fanout_normal,
                       (self.kernel, self.kernel, c, self.features),
                       jnp.float32)
        dt = self.dtype or jnp.promote_types(x.dtype, k.dtype)
        return conv2d_custom_bwd(x.astype(dt), k.astype(dt),
                                 self.stride, self.padding,
                                 self.wgrad, self.dgrad)


def conv_he_fanout(features: int, kernel: int, stride: int = 1,
                   padding: Union[int, str, None] = None, groups: int = 1,
                   dtype=None, name: str | None = None):
    """Bias-free conv with He(fan_out) init; default 'same-style' padding
    k//2 matching the reference's padding=1 for 3x3 / 3 for 7x7.

    ``dtype`` is the compute dtype (bf16 for the TPU fast path); params
    stay float32.  Pointwise stride-1 convs lower to dot_general by
    default (bit-identical, same param tree; +1.6% on plain ResNet-50,
    never slower — perf/r2 waves 4-5); CNSN_CONV1X1=conv restores the
    conv_general_dilated lowering.

    CNSN_CONV3X3 selects the 3×3 *backward* lowering (forward always
    stock): 'conv' (default) = jax autodiff; 'dot' = wgrad as tap dots
    + stride-1 dgrad as flipped forward conv; 'wgrad'/'dgrad' lower
    only that side (A/B attribution)."""
    if padding is None:
        padding = kernel // 2
    if (kernel == 1 and stride == 1 and padding == 0 and groups == 1
            and os.environ.get("CNSN_CONV1X1", "dot") == "dot"):
        return Conv1x1Dot(features, dtype=dtype, name=name)
    mode3 = os.environ.get("CNSN_CONV3X3", "conv")
    if (kernel == 3 and groups == 1 and mode3 != "conv"
            and isinstance(padding, int)):
        wg = {"dot": "dot", "wgrad": "dot", "pallas": "pallas",
              "pallas_tiled": "pallas_tiled"}.get(mode3, "auto")
        dg = "dot" if mode3 in ("dot", "dgrad") else "auto"
        return ConvCustomBwd(features, kernel, stride, padding,
                             wgrad=wg, dgrad=dg, dtype=dtype, name=name)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, use_bias=False, feature_group_count=groups,
                   kernel_init=he_fanout_normal, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class S2DStem(nn.Module):
    """ResNet 7x7/stride-2 stem computed as a 4x4/stride-1 conv on
    2x2 space-to-depth-blocked input — algebraically identical (the
    7x7 kernel is zero-embedded into 8x8 and phase-split), but the MXU
    sees 12 input channels instead of 3 and no strided window (the
    MLPerf-ResNet stem optimization, rebuilt for NHWC/XLA).

    The parameter tree is identical to the plain stem (``kernel`` of
    shape (7, 7, C, features) under this module's name), so
    checkpoints and the torch importer work unchanged.
    """

    features: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        k = self.param("kernel", he_fanout_normal,
                       (7, 7, c, self.features), jnp.float32)
        if h % 2 or w % 2:  # odd input: plain 7x7/s2 conv (same params)
            dt = self.dtype or jnp.promote_types(x.dtype, k.dtype)
            return jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # dy = 2t + ry - 1 (t in [0,4), ry in {0,1}): zero-embed 7->8
        # taps with a leading zero so the reshape splits exact phases
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, c, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c, self.features)
        x2 = x.reshape(n, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h // 2, w // 2, 4 * c)
        dt = self.dtype or jnp.promote_types(x.dtype, k.dtype)
        # source index 2(p + t - 2) + ry: taps p-2 .. p+1 -> pad (2, 1)
        return jax.lax.conv_general_dilated(
            x2.astype(dt), k4.astype(dt), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def linear_torch_default(features: int, dtype=None,
                         name: str | None = None) -> nn.Dense:
    """Dense with torch-default weight init and zero bias (the reference
    zeroes classifier biases explicitly)."""
    return nn.Dense(features, kernel_init=torch_linear_uniform,
                    bias_init=nn.initializers.zeros, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


def linear_kaiming_normal(features: int, dtype=None,
                          name: str | None = None) -> nn.Dense:
    return nn.Dense(features, kernel_init=kaiming_normal_fanin,
                    bias_init=nn.initializers.zeros, dtype=dtype,
                    param_dtype=jnp.float32, name=name)
