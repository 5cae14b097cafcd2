"""Core-op parity tests against PyTorch-CPU oracles.

The oracles re-derive the reference math directly from torch primitives
(unbiased var, AdaIN transfer, BatchNorm semantics) — no reference code
is imported or copied.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from cnsn_tpu.ops import (
    cross_norm_2ins,
    grouped_permutation,
    instance_mean_std,
    instance_norm_mix,
    masked_instance_mean_std,
    region_mask,
    sample_bbox,
)


def torch_ins_mean_std(x_nchw: torch.Tensor, eps=1e-5):
    n, c = x_nchw.shape[:2]
    var = x_nchw.reshape(n, c, -1).var(dim=2) + eps  # unbiased by default
    std = var.sqrt()
    mean = x_nchw.reshape(n, c, -1).mean(dim=2)
    return mean, std


def nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


class TestInstanceStats:
    def test_matches_torch_unbiased(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4, 7, 5, 6).astype(np.float32)  # NCHW
        t_mean, t_std = torch_ins_mean_std(torch.from_numpy(x))
        j_mean, j_std = instance_mean_std(jnp.asarray(nhwc(x)))
        np.testing.assert_allclose(np.asarray(j_mean)[:, 0, 0, :], t_mean.numpy(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_std)[:, 0, 0, :], t_std.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_eps_inside_sqrt(self):
        x = jnp.zeros((2, 4, 4, 3))
        _, std = instance_mean_std(x, eps=1e-5)
        np.testing.assert_allclose(np.asarray(std), np.sqrt(1e-5), rtol=1e-6)

    def test_masked_equals_crop(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(3, 16, 12, 5).astype(np.float32))
        h1, h2, w1, w2 = 2, 11, 3, 10
        mask = region_mask(16, 12, h1, h2, w1, w2)
        m_mean, m_std = masked_instance_mean_std(x, mask)
        c_mean, c_std = instance_mean_std(x[:, h1:h2, w1:w2, :])
        np.testing.assert_allclose(np.asarray(m_mean), np.asarray(c_mean),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m_std), np.asarray(c_std),
                                   rtol=1e-4, atol=1e-5)


class TestInstanceNormMix:
    def test_matches_torch_adain(self):
        rng = np.random.RandomState(2)
        c_np = rng.randn(4, 8, 6, 5).astype(np.float32)
        s_np = rng.randn(4, 8, 3, 7).astype(np.float32)

        tc, ts = torch.from_numpy(c_np), torch.from_numpy(s_np)
        sm, ss = torch_ins_mean_std(ts)
        cm, cs = torch_ins_mean_std(tc)
        expect = ((tc - cm[..., None, None]) / cs[..., None, None]
                  * ss[..., None, None] + sm[..., None, None]).numpy()

        got = instance_norm_mix(jnp.asarray(nhwc(c_np)), jnp.asarray(nhwc(s_np)))
        np.testing.assert_allclose(nhwc(expect), np.asarray(got), rtol=1e-4, atol=1e-5)


class TestBBox:
    def test_area_above_threshold_and_bounds(self):
        h, w = 32, 32
        boxes = jax.jit(jax.vmap(
            lambda k: jnp.stack(sample_bbox(k, h, w, beta=1.0, bbx_thres=0.1))))(
            jax.random.split(jax.random.key(0), 64))
        boxes = np.asarray(boxes)
        h1, h2, w1, w2 = boxes.T
        assert (0 <= h1).all() and (h1 <= h2).all() and (h2 <= h).all()
        assert (0 <= w1).all() and (w1 <= w2).all() and (w2 <= w).all()
        areas = (h2 - h1) * (w2 - w1) / (h * w)
        assert (areas > 0.1).all()
        # With beta=1 the proposal area ratio is uniform; after clipping
        # + rejection at 0.1 the mean realized area is well above 0.1.
        assert 0.2 < float(areas.mean()) < 0.9


class TestCrossNorm:
    def test_neither_output_stats_equal_style_stats(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(8, 10, 9, 4).astype(np.float32))
        key = jax.random.key(0)
        out = cross_norm_2ins(x, key, crop="neither")
        # Recover the permutation used internally.
        k_perm = jax.random.split(key, 4)[0]
        perm = grouped_permutation(k_perm, 8, 1)
        style = jnp.take(x, perm, axis=0)
        sm, ss = instance_mean_std(style)
        om, os_ = instance_mean_std(out)
        np.testing.assert_allclose(np.asarray(om), np.asarray(sm), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(os_), np.asarray(ss), rtol=1e-2, atol=1e-3)

    def test_shape_dtype_preserved_all_modes(self):
        x = jnp.asarray(np.random.RandomState(4).randn(4, 16, 16, 3).astype(np.float32))
        for crop in ["neither", "style", "content", "both"]:
            out = jax.jit(lambda x, k: cross_norm_2ins(x, k, crop=crop))(
                x, jax.random.key(1))
            assert out.shape == x.shape and out.dtype == x.dtype

    def test_content_mode_identity_outside_bbox(self):
        x = jnp.asarray(np.random.RandomState(5).randn(4, 16, 16, 3).astype(np.float32))
        out = cross_norm_2ins(x, jax.random.key(2), crop="content")
        same = np.isclose(np.asarray(out), np.asarray(x)).all(axis=(0, 3))
        # Some spatial positions must be untouched unless bbox covers all,
        # and the bbox region must differ.
        assert (~same).any()

    def test_lam_mix(self):
        x = jnp.asarray(np.random.RandomState(6).randn(4, 8, 8, 3).astype(np.float32))
        key = jax.random.key(3)
        aug = cross_norm_2ins(x, key, crop="neither")
        mixed = cross_norm_2ins(x, key, crop="neither", lam=0.7)
        np.testing.assert_allclose(np.asarray(mixed), 0.7 * np.asarray(x) + 0.3 * np.asarray(aug),
                                   rtol=1e-4, atol=1e-5)

    def test_grouped_permutation_stays_in_shard(self):
        perm = np.asarray(grouped_permutation(jax.random.key(7), 16, num_groups=4))
        assert sorted(perm.tolist()) == list(range(16))
        for g in range(4):
            blk = perm[g * 4:(g + 1) * 4]
            assert set(blk.tolist()) == set(range(g * 4, (g + 1) * 4))

    def test_chan_shuffle(self):
        x = jnp.asarray(np.random.RandomState(8).randn(4, 8, 8, 6).astype(np.float32))
        out = cross_norm_2ins(x, jax.random.key(9), crop="neither", chan=True)
        assert out.shape == x.shape
