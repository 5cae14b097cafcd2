"""Pallas kernels vs jnp oracles (interpret mode on the CPU platform)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cnsn_tpu.ops.pallas.ins_stats import ins_stats_pallas
from cnsn_tpu.ops.pallas.selfnorm import (selfnorm_infer_pallas,
                                          selfnorm_infer_reference)
from cnsn_tpu.ops.stats import instance_mean_std


class TestInsStatsKernel:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 128), (3, 17, 5, 256),
                                       (1, 56, 56, 64)])
    def test_matches_jnp(self, shape):
        x = jnp.asarray(np.random.RandomState(0).randn(*shape)
                        .astype(np.float32))
        mean, std = ins_stats_pallas(x, interpret=True)
        ref_mean, ref_std = instance_mean_std(x)
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(ref_mean)[:, 0, 0, :],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(std),
                                   np.asarray(ref_std)[:, 0, 0, :],
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_input(self):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 128)
                        .astype(np.float32)).astype(jnp.bfloat16)
        mean, std = ins_stats_pallas(x, interpret=True)
        ref_mean, ref_std = instance_mean_std(x.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(ref_mean)[:, 0, 0, :],
                                   rtol=2e-2, atol=2e-2)


class TestSelfNormInferKernel:
    def test_matches_reference(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(3, 14, 14, 128).astype(np.float32))
        w = jnp.asarray(rng.randn(128, 2).astype(np.float32) * 0.3)
        a = jnp.asarray(rng.uniform(0.5, 2.0, 128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
        got = selfnorm_infer_pallas(x, w, a, b, interpret=True)
        ref = selfnorm_infer_reference(x, w, a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestBnSumsKernel:
    """Streaming BN-stats kernel (ops/pallas/bn_stats.py) vs jnp oracle."""

    @pytest.mark.parametrize("shape", [(4, 9, 7, 256), (2, 56, 56, 64),
                                       (3, 5, 5, 128)])
    def test_fwd_matches_jnp(self, shape):
        from cnsn_tpu.ops.pallas.bn_stats import bn_sums_pallas
        rng = np.random.RandomState(0)
        c = shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 + 1.5)
        m0 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        s1, s2 = bn_sums_pallas(x, m0, interpret=True)
        d = np.asarray(x, np.float64) - np.asarray(m0, np.float64)
        np.testing.assert_allclose(np.asarray(s1), d.sum(axis=(0, 1, 2)),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(s2), (d * d).sum(axis=(0, 1, 2)),
                                   rtol=1e-4, atol=1e-3)

    def test_vjp_matches_autodiff(self):
        from cnsn_tpu.ops.pallas.bn_stats import bn_sums
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 7, 5, 128).astype(np.float32))
        m0 = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
        co = jnp.asarray(rng.randn(128).astype(np.float32))

        def f_pallas(x):
            a, b = bn_sums(x, m0, True)
            return jnp.sum(a * co + 0.3 * b)

        def f_jnp(x):
            d = x.astype(jnp.float32) - m0
            return jnp.sum(jnp.sum(d, axis=(0, 1, 2)) * co
                           + 0.3 * jnp.sum(d * d, axis=(0, 1, 2)))

        g_pl = jax.grad(f_pallas)(x)
        g_ref = jax.grad(f_jnp)(x)
        np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


class TestInsStatsV2:
    def test_v2_matches_jnp(self):
        from cnsn_tpu.ops.pallas.ins_stats import ins_stats_v2
        x = jnp.asarray(np.random.RandomState(0).randn(3, 7, 9, 256)
                        .astype(np.float32) * 1.7 + 0.4)
        m, s = ins_stats_v2(x, interpret=True)
        rm, rs = instance_mean_std(x)
        np.testing.assert_allclose(np.asarray(m), np.asarray(rm)[:, 0, 0],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs)[:, 0, 0],
                                   rtol=1e-5, atol=1e-5)

    def test_diff_vjp_matches_autodiff(self):
        from cnsn_tpu.ops.pallas.ins_stats import ins_stats_diff
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 6, 5, 128).astype(np.float32) * 1.3)
        co1 = jnp.asarray(rng.randn(2, 128).astype(np.float32))
        co2 = jnp.asarray(rng.randn(2, 128).astype(np.float32))

        def f_pl(x):
            m, s = ins_stats_diff(x, 1e-5, 1, True)
            return jnp.sum(m * co1 + s * co2)

        def f_ref(x):
            m, s = instance_mean_std(x)
            return jnp.sum(m[:, 0, 0] * co1 + s[:, 0, 0] * co2)

        np.testing.assert_allclose(np.asarray(jax.grad(f_pl)(x)),
                                   np.asarray(jax.grad(f_ref)(x)),
                                   rtol=1e-5, atol=1e-6)

    def test_dispatch_in_instance_mean_std(self, monkeypatch):
        """CNSN_INS_PALLAS=1 routes instance_mean_std through the kernel
        (interpret on CPU) with identical results."""
        import importlib
        import cnsn_tpu.ops.stats as stats_mod
        x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 4, 128)
                        .astype(np.float32))
        ref = stats_mod.instance_mean_std(x)
        monkeypatch.setenv("CNSN_INS_PALLAS", "1")
        importlib.reload(stats_mod)
        try:
            got = stats_mod.instance_mean_std(x)
        finally:
            monkeypatch.delenv("CNSN_INS_PALLAS")
            importlib.reload(stats_mod)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-5, atol=1e-6)
