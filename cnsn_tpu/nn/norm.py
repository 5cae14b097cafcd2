"""Normalization layers with PyTorch-parity semantics, NHWC, Flax linen.

The reference relies on torch.nn.BatchNorm2d/BatchNorm1d/InstanceNorm2d
defaults throughout.  Flax's stock BatchNorm differs from torch in one
observable way (running_var is updated with the *biased* batch variance;
torch uses the unbiased one — torch.nn.BatchNorm docs), so we implement
batch norm explicitly to make imported torch checkpoints and long
training runs numerically faithful.

All layers take channels-last inputs and keep statistics in float32.
"""
from __future__ import annotations

import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["BatchNorm", "BatchNorm1dStats", "InstanceNorm", "IBN", "gelu_sig"]

def _stat_dtype(x):
    """Computation dtype for statistics: at least float32 (bf16 inputs
    are promoted; float64 inputs — x64 parity testing — are kept)."""
    return jnp.promote_types(x.dtype, jnp.float32)



def gelu_sig(x: jax.Array) -> jax.Array:
    """Sigmoid-approximated GELU: x * sigmoid(1.702 x).

    Matches the reference AllConvNet activation
    (models/cifar/allconv_cnsn.py:12-15).
    """
    return x * jax.nn.sigmoid(1.702 * x)


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm2d-parity batch norm over an NHWC tensor.

    Train: normalize with biased batch variance over (N, H, W); update
    running stats with momentum 0.1, storing the *unbiased* variance.
    Eval: normalize with running statistics.

    ``groups`` controls the statistics scope under data parallelism:
    1 (default) reduces over the whole (sharded) batch — GSPMD makes
    that a cross-device reduction, i.e. SyncBatchNorm semantics
    (the reference's opt-in convert_sync_batchnorm,
    segmentation/tool/train_cnsn.py:159-160).  Setting groups to the
    data-parallel width reproduces per-replica DataParallel BN: each
    contiguous batch group normalizes with its own moments and the
    running stats follow group 0 (the master replica).  Env default:
    CNSN_BN_GROUPS.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    axes: Sequence[int] = (0, 1, 2)
    groups: int = int(os.environ.get("CNSN_BN_GROUPS", "1"))
    # 'shifted' (default) = single-pass variance on running-mean-shifted
    #   data: var = E[(x−m₀)²] − E[x−m₀]² with m₀ = running mean.  One
    #   fused reduction pass over x (mean+var together) instead of the
    #   two-pass's two; exact in infinite precision, and the shift makes
    #   the cancellation benign (E[x−m₀] ≈ 0, so no mean²≫var blow-up —
    #   the failure mode that rules out the naive E[x²]−E[x]² form,
    #   measured 0.16 logit divergence vs torch through 50+ BNs).
    #   Cold-start caveat: at step 0 the running mean is zeros, so the
    #   shift is a no-op and the first few dozen steps (momentum 0.1 ⇒
    #   m₀ reaches ~90% of the true mean in ~22 steps) compute the
    #   naive form; the maximum(·,0) clamp bounds the worst case at
    #   var=0 (inv capped by eps).  Harmless for from-scratch SGD, but
    #   for strict parity runs (golden trajectory tests, fine-tuning
    #   from imported torch weights — where the running mean is already
    #   warm anyway) use var_impl='two'.
    # 'two' = centered two-pass (torch's exact reduction order);
    # 'one' = naive single pass (bench A/B only).
    # None → CNSN_BN_VAR env (read at trace time, so tests/runs can
    # switch without re-importing), default 'shifted'.
    var_impl: str | None = None
    # Ghost-BN stats subsampling: compute batch statistics from the
    # leading ``stats_sample`` rows only (0 = whole batch).  The stats
    # pass is the single biggest non-conv cost on TPU (measured 11.5 ms
    # of a 52 ms ResNet-50 step, perf trace r2); sampling cuts that
    # read ~N/s-fold.  Statistically this reproduces the reference's
    # OWN DataParallel semantics — torch BN normalizes per replica, so
    # an 8-GPU b256 run uses 32-sample statistics (cifar.py:395,
    # imagenet.py:533) — except every row is normalized by the shard-0
    # stats instead of its own shard's.  Env: CNSN_BN_SAMPLE.
    # (Measured a net LOSS on v5e — XLA materializes the row slice —
    # kept as a documented knob only.)
    stats_sample: int = int(os.environ.get("CNSN_BN_SAMPLE", "0"))
    # Streaming Pallas statistics kernel (ops/pallas/bn_stats.py): the
    # same shifted one-pass sums, read at full HBM bandwidth (the trace
    # put XLA's convert_reduce ops at ~4x roofline).  Env: CNSN_BN_PALLAS.
    use_pallas: bool = os.environ.get("CNSN_BN_PALLAS", "0") == "1"

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        g = self.groups if (not use_running_average
                            and self.groups > 1
                            and x.shape[0] % self.groups == 0) else 1
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Two-pass (centered) variance: the single-pass
            # E[x²]−E[x]² form cancels catastrophically once mean²≫var
            # (post-ReLU activations), compounding through 50+ BN layers
            # — measured 0.16 logit divergence vs torch on ResNet-50
            # train mode.  XLA fuses both reduction passes.
            xf = x.astype(_stat_dtype(x))
            if g > 1:
                xg = xf.reshape((g, x.shape[0] // g) + x.shape[1:])
                axes = tuple(range(1, xg.ndim - 1))
                n = math.prod(xg.shape[1:-1])
                mean = jnp.mean(xg, axis=axes)              # (g, C)
                mshape = (g,) + (1,) * (xg.ndim - 2) + (self.features,)
                var = jnp.mean(jnp.square(xg - mean.reshape(mshape)),
                               axis=axes)
            else:
                axes = tuple(self.axes)
                xs = xf
                s = self.stats_sample
                if s and 0 < s < x.shape[0]:
                    xs = xf[:s]
                n = 1
                for a in axes:
                    n *= xs.shape[a]
                mshape = [1] * x.ndim
                mshape[-1] = self.features
                var_impl = self.var_impl or os.environ.get(
                    "CNSN_BN_VAR", "shifted")
                if var_impl == "shifted":
                    m0 = jax.lax.stop_gradient(ra_mean.value)
                    from ..ops.pallas import pallas_dispatch
                    use, interp = pallas_dispatch()
                    if (self.use_pallas and use and x.ndim == 4
                            and tuple(axes) == (0, 1, 2)
                            and not (s and 0 < s < x.shape[0])):
                        # feed the pre-cast activation: pallas_call is
                        # opaque to fusion, so an fp32 cast here would
                        # materialize a full-size copy; the kernel
                        # converts bf16→fp32 in VMEM instead.
                        from ..ops.pallas.bn_stats import bn_sums
                        s1, s2 = bn_sums(x, m0, interp)
                        mean_d = s1 / n
                        var = jnp.maximum(s2 / n - jnp.square(mean_d), 0.0)
                    else:
                        d = xs - m0.reshape(mshape)
                        mean_d = jnp.mean(d, axis=axes)
                        var = jnp.maximum(
                            jnp.mean(jnp.square(d), axis=axes)
                            - jnp.square(mean_d), 0.0)
                    mean = m0 + mean_d
                elif var_impl == "one":
                    mean = jnp.mean(xs, axis=axes)
                    var = (jnp.mean(jnp.square(xs), axis=axes)
                           - jnp.square(mean))
                else:
                    mean = jnp.mean(xs, axis=axes)
                    var = jnp.mean(jnp.square(xs - mean.reshape(mshape)),
                                   axis=axes)
            if not self.is_initializing():
                m = self.momentum
                mean0 = mean[0] if g > 1 else mean
                var0 = var[0] if g > 1 else var
                unbiased = var0 * (n / max(n - 1, 1))
                ra_mean.value = (1 - m) * ra_mean.value + m * mean0
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        if g > 1:
            inv = jax.lax.rsqrt(var + self.eps) * scale       # (g, C)
            gshape = (g,) + (1,) * (x.ndim - 1) + (self.features,)
            xg = x.astype(_stat_dtype(x)).reshape(
                (g, x.shape[0] // g) + x.shape[1:])
            out = ((xg - mean.reshape(gshape)) * inv.reshape(gshape)
                   + bias.reshape((1,) * x.ndim + (self.features,)))
            return out.reshape(x.shape).astype(dtype)

        shape = [1] * x.ndim
        shape[-1] = self.features
        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (x.astype(_stat_dtype(x)) - mean.reshape(shape)) * inv.reshape(shape) \
            + bias.reshape(shape)
        return out.astype(dtype)


class BatchNorm1dStats(nn.Module):
    """torch.nn.BatchNorm1d over a (N, C) tensor of per-channel scalars.

    Used inside SelfNorm, where the reference applies BatchNorm1d to the
    (B, C, 1) squeezed statistics (models/cnsn.py:121,138).  Reduction
    is over the batch axis only.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, y: jax.Array, use_running_average: bool) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        yf = y.astype(_stat_dtype(y))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Two-pass centered variance: the per-channel statistics fed
            # to this BN have var ≪ mean² (a smooth statistic over a
            # small batch), the worst case for E[y²]−E[y]² cancellation
            # — measured 1.8e-3 SelfNorm divergence vs torch.
            n = y.shape[0]
            mean = jnp.mean(yf, axis=0)
            var = jnp.mean(jnp.square(yf - mean), axis=0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        out = (yf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(y.dtype)


class InstanceNorm(nn.Module):
    """torch.nn.InstanceNorm2d(affine=True) over NHWC.

    Per-(sample, channel) normalization over H*W with biased variance;
    no running statistics (torch default track_running_stats=False).
    Used by the IBN blocks (models/imagenet/resnet_ibn_cnsn.py:24-44).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(_stat_dtype(x))
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = out * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)
        return out.astype(x.dtype)


class MultiBatchNorm(nn.Module):
    """Domain-specific BatchNorm (AdaBN): one running-stat bank per
    domain, shared affine — the reference's MultiBatchNorm
    (segmentation/util/util.py:222-237, present but unused by the
    shipped trainer).  ``domain`` is a static int selecting the bank.
    """

    features: int
    num_domains: int = 2
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool,
                 domain: int = 0) -> jax.Array:
        assert 0 <= domain < self.num_domains
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.num_domains, self.features), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.num_domains, self.features), jnp.float32))

        xf = x.astype(_stat_dtype(x))
        if use_running_average:
            mean, var = ra_mean.value[domain], ra_var.value[domain]
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = ra_mean.value.at[domain].set(
                    (1 - m) * ra_mean.value[domain] + m * mean)
                ra_var.value = ra_var.value.at[domain].set(
                    (1 - m) * ra_var.value[domain] + m * unbiased)
        shape = [1] * x.ndim
        shape[-1] = self.features
        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (xf - mean.reshape(shape)) * inv.reshape(shape) \
            + bias.reshape(shape)
        return out.astype(x.dtype)


class IBN(nn.Module):
    """Instance-Batch Normalization: IN on the first half of the
    channels, BN on the rest (IBN-Net; reference
    models/imagenet/resnet_ibn_cnsn.py:24-44)."""

    features: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        half = int(self.features * self.ratio)
        x_in, x_bn = x[..., :half], x[..., half:]
        out1 = InstanceNorm(half, name="IN")(x_in)
        out2 = BatchNorm(self.features - half, name="BN")(x_bn, use_running_average)
        return jnp.concatenate([out1, out2], axis=-1)
