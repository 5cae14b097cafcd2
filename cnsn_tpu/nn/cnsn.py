"""CrossNorm / SelfNorm / CNSN as functional Flax modules.

Redesign of the reference's stateful module protocol
(reference: models/cnsn.py:94-164): the mutable ``.active`` flag set by
``_enable_cross_norm`` becomes an explicit per-site boolean (sliced from
a mask the train step samples once per batch), and the host RNG becomes
a ``'crossnorm'`` Flax RNG collection — every site derives its own key
from its module path, so the op is pure, jit-compatible, and replayable.

Inactive sites cost nothing at runtime: the swap is wrapped in a
``lax.cond`` on the active bit.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.crossnorm import cross_norm_2ins
from ..ops.stats import instance_mean_std
from .norm import BatchNorm1dStats

__all__ = ["CrossNorm", "SelfNorm", "CNSN"]


def _conv1d_k2_init(key, shape, dtype=jnp.float32):
    """torch Conv1d(C, C, k=2, groups=C) default init:
    kaiming_uniform(a=sqrt(5)) with fan_in = 2  →  U(±sqrt(1/2))."""
    bound = (1.0 / 2.0) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class CrossNorm(nn.Module):
    """One CrossNorm site (reference: models/cnsn.py:94-110).

    ``active`` is a traced boolean scalar; when None (plain forward /
    eval) the module is the identity and consumes no RNG.
    """

    crop: str = "neither"
    beta: float = 1.0
    bbx_thres: float = 0.1
    lam: Optional[float] = None
    chan: bool = False
    num_groups: int = 1
    # 'cond' skips idle sites via lax.cond; 'fma' is branchless (stats
    # always, gate folded into a fused scale/shift).  Env override for
    # benchmarking: CNSN_CN_IMPL.
    impl: str = os.environ.get("CNSN_CN_IMPL", "fma")

    @nn.compact
    def __call__(self, x: jax.Array, active: Optional[jax.Array] = None) -> jax.Array:
        if active is None:
            return x
        key = self.make_rng("crossnorm")
        kw = dict(crop=self.crop, beta=self.beta, bbx_thres=self.bbx_thres,
                  lam=self.lam, chan=self.chan, num_groups=self.num_groups)

        if self.impl == "fma":
            from ..ops.crossnorm import cross_norm_fma
            return cross_norm_fma(x, key, active, **kw)

        def swap(x):
            return cross_norm_2ins(x, key, **kw)

        return jax.lax.cond(active, swap, lambda x: x, x)


class SelfNorm(nn.Module):
    """SelfNorm: attention recalibration of instance statistics
    (reference: models/cnsn.py:113-150).

    Per (sample, channel): y = w0*mean + w1*std (a per-channel 2→1 FC,
    the reference's grouped Conv1d) → BatchNorm1d → sigmoid → scale x.
    ``is_two`` adds the mean-recalibration branch (dead option in the
    reference — every instantiation uses the default False).
    """

    features: int
    is_two: bool = False
    eps: float = 1e-12
    # Opt-in fused Pallas eval path.  Measured on v5e: XLA's two-pass
    # fusion currently beats the hand kernel (144 vs 332 us on a
    # 32x14x14x1024 block), so default off until the kernel is tiled
    # better; flip with use_pallas=True or CNSN_SN_PALLAS=1.
    use_pallas: bool = os.environ.get("CNSN_SN_PALLAS") == "1"

    def _fused_eval(self, x, g_w):
        """Fully fused single-pass eval path (Pallas, TPU): fold the BN
        running stats into an affine and gate in one VMEM pass."""
        from ..ops.pallas.selfnorm import selfnorm_infer_pallas
        bn = self.variables["batch_stats"]["g_bn"]
        p = self.variables["params"]["g_bn"]
        a = p["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5)
        b = p["bias"] - a * bn["mean"]
        return selfnorm_infer_pallas(x, g_w, a, b, eps=self.eps)

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        c = self.features
        g_w = self.param("g_fc", _conv1d_k2_init, (c, 2))

        from ..ops.pallas.selfnorm import selfnorm_fits_vmem
        if (use_running_average and not self.is_two and self.use_pallas
                and not self.is_initializing()
                and "g_bn" in self.variables.get("params", {})
                and jax.default_backend() in ("tpu", "axon")
                and selfnorm_fits_vmem(x.shape[1], x.shape[2], c)):
            # keep BN params registered for checkpoint structure
            return self._fused_eval(x, g_w)

        mean, std = instance_mean_std(x, eps=self.eps)  # (N,1,1,C)
        stats = jnp.stack(
            [mean.reshape(x.shape[0], c), std.reshape(x.shape[0], c)], axis=-1
        )  # (N, C, 2)

        g_y = jnp.einsum("nck,ck->nc", stats.astype(jnp.float32), g_w)
        g_y = BatchNorm1dStats(c, name="g_bn")(g_y, use_running_average)
        g = jax.nn.sigmoid(g_y).reshape(x.shape[0], 1, 1, c).astype(x.dtype)

        if self.is_two:
            f_w = self.param("f_fc", _conv1d_k2_init, (c, 2))
            f_y = jnp.einsum("nck,ck->nc", stats.astype(jnp.float32), f_w)
            f_y = BatchNorm1dStats(c, name="f_bn")(f_y, use_running_average)
            f = jax.nn.sigmoid(f_y).reshape(x.shape[0], 1, 1, c).astype(x.dtype)
            return x * g + mean.astype(x.dtype) * (f - g)
        return x * g


class CNSN(nn.Module):
    """CrossNorm-then-SelfNorm composition (reference: models/cnsn.py:152-164)."""

    features: int
    cnsn_type: str  # 'cn' | 'sn' | 'cnsn'
    crop: str = "neither"
    beta: float = 1.0
    num_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, active: Optional[jax.Array],
                 use_running_average: bool) -> jax.Array:
        if self.cnsn_type not in ("cn", "sn", "cnsn"):
            raise ValueError(f"bad cnsn_type {self.cnsn_type!r}")
        if "cn" in self.cnsn_type:
            x = CrossNorm(crop=self.crop, beta=self.beta,
                          num_groups=self.num_groups, name="crossnorm")(x, active)
        if "sn" in self.cnsn_type:
            x = SelfNorm(self.features, name="selfnorm")(x, use_running_average)
        return x
