"""Fused CNSN fast-path tests: parameter-tree compatibility and math
equivalence with the unfused CrossNorm→SelfNorm composition."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from cnsn_tpu.nn.cnsn import CNSN
from cnsn_tpu.ops.stats import instance_mean_std


@pytest.fixture
def x():
    return jnp.asarray(np.random.RandomState(0)
                       .randn(8, 12, 10, 6).astype(np.float32))


@pytest.mark.parametrize("crop", ["neither", "style"])
def test_param_tree_identical(x, crop):
    fused = CNSN(features=6, cnsn_type="cnsn", crop=crop, fuse=True)
    plain = CNSN(features=6, cnsn_type="cnsn", crop=crop, fuse=False)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1)}
    v1 = plain.init(rngs, x, jnp.asarray(True), False)
    v2 = fused.init(rngs, x, jnp.asarray(True), False)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))


@pytest.mark.parametrize("crop", ["neither", "style"])
def test_inactive_equals_unfused(x, crop):
    fused = CNSN(features=6, cnsn_type="cnsn", crop=crop, fuse=True)
    plain = CNSN(features=6, cnsn_type="cnsn", crop=crop, fuse=False)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1)}
    v = plain.init(rngs, x, jnp.asarray(True), False)
    kw = dict(rngs={"crossnorm": jax.random.key(5)},
              mutable=["batch_stats"])
    of, _ = fused.apply(v, x, jnp.asarray(False), False, **kw)
    op, _ = plain.apply(v, x, jnp.asarray(False), False, **kw)
    # fp noise from the sigma^2 - eps algebra round-trip only
    np.testing.assert_allclose(np.asarray(of), np.asarray(op),
                               rtol=1e-4, atol=1e-4)


class _FusedHarness(nn.Module):
    """Wraps fused/unfused CNSN under the SAME module name so both draw
    the identical 'crossnorm' RNG stream — isolating the math."""
    fuse: bool
    crop: str = "neither"

    @nn.compact
    def __call__(self, x, active, ura):
        return CNSN(features=6, cnsn_type="cnsn", crop=self.crop,
                    fuse=self.fuse, name="site")(x, active, ura)


def test_active_fused_matches_composed_math(x):
    """With fuse=True the CNSN-level key drives (perm, bbox).  Verify the
    fused output's per-(N,C) statistics equal sigmoid-gated style stats:
    stats(out) = (mu_s, sigma_s) · g, which only holds if the combined
    FMA implements SN(CN(x)) exactly."""
    h = _FusedHarness(fuse=True)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1)}
    v = h.init(rngs, x, jnp.asarray(True), False)
    out, _ = h.apply(v, x, jnp.asarray(True), False,
                     rngs={"crossnorm": jax.random.key(9)},
                     mutable=["batch_stats"])
    out = np.asarray(out, np.float64)

    # Independent oracle: out must be an affine map of x per (N, C)
    # (out = x*(scale*g) + shift*g), so regressing out on x per channel
    # recovers a perfect fit.
    xs = np.asarray(x, np.float64)
    for ni in range(3):
        for ci in range(6):
            a = xs[ni, :, :, ci].ravel()
            b = out[ni, :, :, ci].ravel()
            coef = np.polyfit(a, b, 1)
            resid = b - np.polyval(coef, a)
            assert np.abs(resid).max() < 1e-4
    # and the map must differ from identity for at least one (N, C)
    assert not np.allclose(out, xs, atol=1e-3)


def test_fused_train_step_gradients_flow(x):
    h = _FusedHarness(fuse=True)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1)}
    v = h.init(rngs, x, jnp.asarray(True), False)

    def loss(params):
        out, _ = h.apply({**v, "params": params}, x, jnp.asarray(True),
                         False, rngs={"crossnorm": jax.random.key(2)},
                         mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(v["params"])
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
