"""conv2d_custom_bwd: hand-lowered conv gradients vs jax autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnsn_tpu.ops.convdot import conv2d_custom_bwd, _fwd_conv


def _loss_grads(fn, x, k):
    def loss(x, k):
        y = fn(x, k)
        # non-uniform cotangent so flipped/shifted-index bugs can't cancel
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return jnp.sum(y * w)
    return jax.grad(loss, argnums=(0, 1))(x, k)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("wgrad,dgrad", [("dot", "dot"), ("dot", "auto"),
                                         ("auto", "dot"), ("auto", "auto")])
def test_conv_custom_bwd_matches_autodiff(stride, wgrad, dgrad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 9, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))

    ref = lambda x, k: _fwd_conv(x, k, stride, 1)
    cus = lambda x, k: conv2d_custom_bwd(x, k, stride, 1, wgrad, dgrad)

    np.testing.assert_allclose(np.asarray(cus(x, k)), np.asarray(ref(x, k)),
                               rtol=1e-6, atol=1e-6)
    dx_r, dk_r = _loss_grads(ref, x, k)
    dx_c, dk_c = _loss_grads(cus, x, k)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_r),
                               rtol=1e-5, atol=1e-5)


def test_conv_custom_bwd_even_input_stride2():
    # stride-2 with even spatial size: the R50 layer-boundary shape class
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    ref = lambda x, k: _fwd_conv(x, k, 2, 1)
    cus = lambda x, k: conv2d_custom_bwd(x, k, 2, 1, "dot", "dot")
    dx_r, dk_r = _loss_grads(ref, x, k)
    dx_c, dk_c = _loss_grads(cus, x, k)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_r),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_model_gate(monkeypatch):
    """CNSN_CONV3X3=dot swaps the module but keeps the param tree and
    the forward bit-identical."""
    from cnsn_tpu.models.common import conv_he_fanout

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))

    monkeypatch.setenv("CNSN_CONV3X3", "conv")
    m0 = conv_he_fanout(6, 3, 2)
    p0 = m0.init(jax.random.key(0), x)
    monkeypatch.setenv("CNSN_CONV3X3", "dot")
    m1 = conv_he_fanout(6, 3, 2)
    p1 = m1.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(np.asarray(m1.apply(p0, x)),
                               np.asarray(m0.apply(p0, x)), rtol=1e-6)


def test_wgrad3x3_pallas_matches_autodiff():
    """Implicit-GEMM Pallas wgrad (interpret mode on CPU) vs autodiff."""
    from cnsn_tpu.ops.pallas.conv_wgrad import wgrad3x3_pallas

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 10, 12, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    dy_np = rng.randn(3, 10, 12, 16).astype(np.float32)

    _, pullback = jax.vjp(lambda k_: _fwd_conv(x, k_, 1, 1), k)
    dk_ref = pullback(jnp.asarray(dy_np))[0]
    dk = wgrad3x3_pallas(x, jnp.asarray(dy_np), 1, interpret=True)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_custom_bwd_pallas_mode_end_to_end():
    """wgrad='pallas' through the custom_vjp (interpret on CPU)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    ref = lambda x, k: _fwd_conv(x, k, 1, 1)
    cus = lambda x, k: conv2d_custom_bwd(x, k, 1, 1, "pallas", "auto")
    dx_r, dk_r = _loss_grads(ref, x, k)
    dx_c, dk_c = _loss_grads(cus, x, k)
    np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)

def test_wgrad3x3_tiled_matches_autodiff():
    """Batch-tiled implicit-GEMM Pallas wgrad (interpret mode on CPU)
    vs autodiff, including a Cout-tiled plan."""
    from cnsn_tpu.ops.pallas.conv_wgrad import wgrad3x3_tiled

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 10, 12, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    dy = jnp.asarray(rng.randn(4, 10, 12, 16).astype(np.float32))

    _, pullback = jax.vjp(lambda k_: _fwd_conv(x, k_, 1, 1), k)
    dk_ref = pullback(dy)[0]
    for plan in ((2, 16), (4, 8), (2, 8)):
        dk = wgrad3x3_tiled(x, dy, 1, interpret=True, plan=plan)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                                   rtol=1e-4, atol=1e-4, err_msg=str(plan))


def test_wgrad3x3_tile_plan():
    """Plan picker: prefers the full Cout tile, tiles Cout only when
    the fp32 output block forces it, and respects the VMEM budget."""
    from cnsn_tpu.ops.pallas.conv_wgrad import wgrad3x3_tile_plan

    # R50 layer1 shape: full cout; the 1 MB slice-copy cap (measured
    # Mosaic crash boundary) holds bt to 2
    plan = wgrad3x3_tile_plan(128, 56, 56, 64, 64)
    assert plan == (2, 64), plan
    # R50 layer4 shape: the 9.4 MB fp32 (9*512, 512) block still fits
    # whole (measured 11.6 MB total at bt=8)
    plan = wgrad3x3_tile_plan(128, 7, 7, 512, 512)
    assert plan == (8, 512), plan
    # an 18.9 MB fp32 output block forces the Cout split
    plan = wgrad3x3_tile_plan(128, 7, 7, 512, 1024)
    assert plan is not None and plan[1] < 1024
    bt, cout_t = plan
    per_img = (9 * 9 * 512 + 7 * 7 * cout_t) * 2
    assert 2 * bt * per_img + 9 * 512 * cout_t * 4 <= 12 * 1024 * 1024
    # absurd shape: no feasible plan
    assert wgrad3x3_tile_plan(2, 224, 224, 512, 512) is None


def test_conv_custom_bwd_pallas_tiled_mode_end_to_end(monkeypatch):
    """wgrad='pallas_tiled' through the custom_vjp (interpret on CPU).
    The shape gate (wgrad3x3_tiled_wins) would route this small test
    shape to the custom-call; force the kernel so it's exercised."""
    monkeypatch.setenv("CNSN_WGRAD_TILED_FORCE", "1")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(4, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    ref = lambda x, k: _fwd_conv(x, k, 1, 1)
    cus = lambda x, k: conv2d_custom_bwd(x, k, 1, 1, "pallas_tiled", "auto")
    dx_r, dk_r = _loss_grads(ref, x, k)
    dx_c, dk_c = _loss_grads(cus, x, k)
    np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)


def test_wgrad3x3_tiled_wins_gate():
    """Dispatch policy: only the measured-win shape class (small
    spatial, >=512 channels) routes to the batch-tiled kernel."""
    from cnsn_tpu.ops.pallas.conv_wgrad import wgrad3x3_tiled_wins

    assert wgrad3x3_tiled_wins(128, 7, 7, 512, 512)
    assert not wgrad3x3_tiled_wins(128, 56, 56, 64, 64)
    assert not wgrad3x3_tiled_wins(128, 28, 28, 128, 128)
    assert not wgrad3x3_tiled_wins(128, 14, 14, 256, 256)
