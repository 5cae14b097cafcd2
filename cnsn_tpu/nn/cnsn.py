"""CrossNorm / SelfNorm / CNSN as functional Flax modules.

Redesign of the reference's stateful module protocol
(reference: models/cnsn.py:94-164): the mutable ``.active`` flag set by
``_enable_cross_norm`` becomes an explicit per-site boolean (sliced from
a mask the train step samples once per batch), and the host RNG becomes
a ``'crossnorm'`` Flax RNG collection — every site derives its own key
from its module path, so the op is pure, jit-compatible, and replayable.

The CrossNorm gate is branchless by default (``impl='fma'``: the
active bit folds into a fused per-(N, C) scale/shift — measured faster
on TPU than skipping idle sites with ``lax.cond``), and CNSN sites fuse
the SelfNorm statistics into the same pass (see CNSN docstring).
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
    # Fused Pallas eval path: one HBM read + one write per site.  Wins
    # 1.19-1.39x on STANDALONE ResNet-50 serving shapes
    # (perf/pallas_sn.jsonl) but LOSES 2x inside the full eval graph —
    # the opaque custom-call breaks XLA's cross-op fusion around each
    # site (serving 4854 vs 9671 img/s measured, perf wave 10) — so it
    # ships OFF.  Opt in with CNSN_SN_PALLAS=1 for site-isolated use.
    use_pallas: bool = os.environ.get("CNSN_SN_PALLAS", "0") == "1"

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
    def __call__(self, x: jax.Array, use_running_average: bool,
                 stats=None, gate_only: bool = False) -> jax.Array:
        """``stats``: optional precomputed (mean, std), each (N, C) —
        used by the fused CNSN path, which knows the post-CrossNorm
        statistics analytically.  ``gate_only`` returns the (N,1,1,C)
        gate instead of the scaled activation."""
        c = self.features
        g_w = self.param("g_fc", _conv1d_k2_init, (c, 2))

        from ..ops.pallas.selfnorm import selfnorm_fits_vmem
        if (stats is None and not gate_only
                and use_running_average and not self.is_two and self.use_pallas
                and not self.is_initializing()
                and "g_bn" in self.variables.get("params", {})
                and jax.default_backend() in ("tpu", "axon")
                and c % 128 == 0
                and selfnorm_fits_vmem(x.shape[1], x.shape[2], c)):
            # keep BN params registered for checkpoint structure
            return self._fused_eval(x, g_w)

        if stats is None:
            mean, std = instance_mean_std(x, eps=self.eps)  # (N,1,1,C)
            mean_nc = mean.reshape(x.shape[0], c)
            std_nc = std.reshape(x.shape[0], c)
        else:
            mean_nc, std_nc = stats
            mean = mean_nc.reshape(x.shape[0], 1, 1, c)
        stats_nc2 = jnp.stack([mean_nc, std_nc], axis=-1)  # (N, C, 2)

        sdt = jnp.promote_types(x.dtype, jnp.float32)
        g_y = jnp.einsum("nck,ck->nc", stats_nc2.astype(sdt), g_w)
        g_y = BatchNorm1dStats(c, name="g_bn")(g_y, use_running_average)
        g = jax.nn.sigmoid(g_y).reshape(x.shape[0], 1, 1, c).astype(x.dtype)
        if gate_only:
            assert not self.is_two
            return g

        if self.is_two:
            f_w = self.param("f_fc", _conv1d_k2_init, (c, 2))
            f_y = jnp.einsum("nck,ck->nc", stats_nc2.astype(sdt), f_w)
            f_y = BatchNorm1dStats(c, name="f_bn")(f_y, use_running_average)
            f = jax.nn.sigmoid(f_y).reshape(x.shape[0], 1, 1, c).astype(x.dtype)
            return x * g + mean.astype(x.dtype) * (f - g)
        return x * g


class CNSN(nn.Module):
    """CrossNorm-then-SelfNorm composition (reference: models/cnsn.py:152-164).

    Fused fast path: for global-affine crop modes ('neither'/'style'),
    CrossNorm's output is x·scale + shift per (N, C), so SelfNorm's
    instance statistics follow algebraically from CrossNorm's single
    stats pass — μ_out = μ_c·scale + shift and
    σ_out = sqrt((σ_c²−eps_cn)·scale² + eps_sn), both exact.  The whole
    CNSN site then costs one stats pass + one combined FMA
    (x·(scale·g) + shift·g) instead of two stats passes + two apply
    passes.  Enabled automatically during aug forwards when valid;
    ``fuse=False`` forces the reference-shaped composition.
    """

    features: int
    cnsn_type: str  # 'cn' | 'sn' | 'cnsn'
    crop: str = "neither"
    beta: float = 1.0
    num_groups: int = 1
    fuse: bool = os.environ.get("CNSN_FUSE", "1") == "1"

    @nn.compact
    def __call__(self, x: jax.Array, active: Optional[jax.Array],
                 use_running_average: bool) -> jax.Array:
        if self.cnsn_type not in ("cn", "sn", "cnsn"):
            raise ValueError(f"bad cnsn_type {self.cnsn_type!r}")

        if (self.fuse and self.cnsn_type == "cnsn" and active is not None
                and self.crop in ("neither", "style")):
            from ..ops.bbox import sample_bbox
            from ..ops.crossnorm import grouped_permutation
            from ..ops.stats import (masked_instance_mean_std, region_mask)

            eps_cn = 1e-5
            n, h, w, c = x.shape
            ct = jnp.promote_types(x.dtype, jnp.float32)
            key = self.make_rng("crossnorm")
            k_perm, k_style, _, _ = jax.random.split(key, 4)
            perm = grouped_permutation(k_perm, n, self.num_groups)

            c_mean, c_std = instance_mean_std(x, eps=eps_cn, out_dtype=ct)
            if self.crop == "style":
                sh1, sh2, sw1, sw2 = sample_bbox(k_style, h, w,
                                                 beta=self.beta)
                smask = region_mask(h, w, sh1, sh2, sw1, sw2)
                s_mean_all, s_std_all = masked_instance_mean_std(
                    x, smask, eps=eps_cn, out_dtype=ct)
            else:
                s_mean_all, s_std_all = c_mean, c_std
            s_mean = jnp.take(s_mean_all, perm, axis=0)
            s_std = jnp.take(s_std_all, perm, axis=0)

            cm, cs = c_mean, c_std
            scale = jnp.where(active, s_std / cs, 1.0)
            shift = jnp.where(active, s_mean - cm * (s_std / cs), 0.0)

            # SelfNorm statistics of the affine CN output, exact algebra:
            # μ_out = μ_c·scale + shift;  var_out = (σ_c² − eps_cn)·scale²
            sn = SelfNorm(self.features, name="selfnorm")
            sn_mean = (cm * scale + shift).reshape(n, c)
            var_x = jnp.maximum(cs * cs - eps_cn, 0.0)
            sn_std = jnp.sqrt(var_x * (scale * scale) + sn.eps).reshape(n, c)
            g = sn(x, use_running_average, stats=(sn_mean, sn_std),
                   gate_only=True).astype(ct)

            out = x.astype(ct) * (scale * g) + shift * g
            return out.astype(x.dtype)

        if "cn" in self.cnsn_type:
            x = CrossNorm(crop=self.crop, beta=self.beta,
                          num_groups=self.num_groups, name="crossnorm")(x, active)
        if "sn" in self.cnsn_type:
            x = SelfNorm(self.features, name="selfnorm")(x, use_running_average)
        return x
