"""Model zoo structural tests: shapes, cn site counts, param counts,
CN activation protocol, and train/eval mode behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cnsn_tpu.models import build_model


def param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init_model(model, shape, train=False, cn_active=None):
    rngs = {"params": jax.random.key(0)}
    if cn_active is not None:
        rngs["crossnorm"] = jax.random.key(1)
    x = jnp.zeros(shape, jnp.float32)
    return model.init(rngs, x, train, cn_active), x


CIFAR_CASES = [
    # (name, knobs, cn_num, reference param count)
    ("wideresnet", dict(pos="post", cnsn_type="cnsn", crop="both", beta=1.0), 18, None),
    ("allconv", dict(pos="1", cnsn_type="cn", crop="neither", beta=1.0), 9, None),
    ("densenet", dict(pos="conv1_pre", cnsn_type="cnsn", crop="both", beta=1.0), 36, None),
    ("resnext", dict(pos="residual", cnsn_type="cnsn", crop="neither", beta=1.0), 9, None),
]


class TestCifarModels:
    @pytest.mark.parametrize("name,knobs,cn_num,_", CIFAR_CASES,
                             ids=[c[0] for c in CIFAR_CASES])
    def test_forward_shapes_and_sites(self, name, knobs, cn_num, _):
        model = build_model(name, num_classes=10, **knobs)
        assert model.cn_num == cn_num
        variables, x = init_model(model, (2, 32, 32, 3))
        logits = model.apply(variables, x, False, None)
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()

    def test_wrn_param_count_matches_reference_scale(self):
        # WRN-40-2 baseline ~2.24M params; SN adds (2C + 2C BN) per site.
        model = build_model("wideresnet", num_classes=100, pos="post",
                            cnsn_type="cn", crop="both", beta=1.0)
        variables, x = init_model(model, (2, 32, 32, 3))
        n = param_count(variables["params"])
        assert 2.2e6 < n < 2.35e6

    def test_cn_activation_changes_output_only_when_active(self):
        model = build_model("allconv", num_classes=10, pos="1",
                            cnsn_type="cn", crop="neither", beta=1.0)
        variables, _ = init_model(model, (4, 32, 32, 3))
        x = jnp.asarray(np.random.RandomState(0).randn(8, 32, 32, 3)
                        .astype(np.float32))
        mask_off = jnp.zeros((9,), bool)
        mask_on = mask_off.at[3].set(True)

        def fwd(mask, key):
            out, _ = model.apply(
                variables, x, True, mask,
                rngs={"crossnorm": jax.random.key(key),
                      "dropout": jax.random.key(9)},
                mutable=["batch_stats"])
            return np.asarray(out)

        out_plain = fwd(None, 5)
        out_off = fwd(mask_off, 5)
        np.testing.assert_allclose(out_plain, out_off, rtol=1e-5, atol=1e-5)
        # The pairing permutation can occasionally be the identity (a
        # no-op swap); require a visible change for at least one key.
        changed = [not np.allclose(fwd(mask_on, k), out_off, atol=1e-4)
                   for k in (5, 6, 7)]
        assert any(changed)

    def test_eval_deterministic(self):
        model = build_model("wideresnet", num_classes=10, pos="residual",
                            cnsn_type="sn", crop="neither", beta=1.0)
        variables, _ = init_model(model, (2, 32, 32, 3))
        x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3)
                        .astype(np.float32))
        a = model.apply(variables, x, False, None)
        b = model.apply(variables, x, False, None)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestImageNetModels:
    @pytest.mark.parametrize("name,cnsn_type,pos,cn_num", [
        ("resnet50", "cnsn", "residual", 16),
        ("resnet50", None, None, 0),
        ("resnet50_ibn_a", "sn", "residual", 0),
        ("resnet50_ibn_b", "cnsn", "post", 14),
    ])
    def test_forward_and_sites(self, name, cnsn_type, pos, cn_num):
        model = build_model(name, num_classes=1000, pos=pos,
                            cnsn_type=cnsn_type, crop="neither", beta=1.0)
        assert model.cn_num == cn_num
        variables, x = init_model(model, (2, 64, 64, 3))
        logits = model.apply(variables, x, False, None)
        assert logits.shape == (2, 1000)
        assert np.isfinite(np.asarray(logits)).all()

    def test_resnet50_param_count(self):
        # torchvision ResNet-50: 25,557,032 params.
        model = build_model("resnet50", num_classes=1000)
        variables, _ = init_model(model, (1, 64, 64, 3))
        assert param_count(variables["params"]) == 25_557_032


def test_s2d_stem_equals_conv_stem():
    """stem='s2d' is an exact algebraic rewrite of the 7x7/s2 stem:
    same param tree, same logits (fp32 tolerance)."""
    from cnsn_tpu.models import build_model
    a = build_model("resnet50", num_classes=10)
    b = build_model("resnet50", num_classes=10, stem="s2d")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    va = a.init({"params": jax.random.key(0)}, x, False, None)
    # identical param tree -> reuse the same variables
    jax.tree_util.tree_all(jax.tree.map(
        lambda p, q: p.shape == q.shape, va,
        b.init({"params": jax.random.key(0)}, x, False, None)))
    la = a.apply(va, x, False, None)
    lb = b.apply(va, x, False, None)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_dot_equals_conv(monkeypatch):
    """CNSN_CONV1X1=dot lowers pointwise stride-1 convs to dot_general:
    bit-identical forward, same param tree."""
    import importlib
    import cnsn_tpu.models.common as common
    import cnsn_tpu.models.resnet as rn

    monkeypatch.setenv("CNSN_CONV1X1", "dot")
    importlib.reload(common); importlib.reload(rn)
    try:
        m_dot = rn.resnet50(num_classes=10)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                        jnp.float32)
        v = m_dot.init({"params": jax.random.key(0)}, x, False, None)
        ld = m_dot.apply(v, x, False, None)
    finally:
        monkeypatch.setenv("CNSN_CONV1X1", "conv")
        importlib.reload(common); importlib.reload(rn)
    m_conv = rn.resnet50(num_classes=10)
    v2 = m_conv.init({"params": jax.random.key(0)}, x, False, None)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    lc = m_conv.apply(v, x, False, None)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lc))


def test_s2d_stem_odd_size_fallback():
    """Odd spatial input routes through the plain 7x7/s2 conv path of
    S2DStem (same params): output matches the conv stem exactly."""
    import cnsn_tpu.models.resnet as rn
    x = jnp.asarray(np.random.RandomState(3).randn(2, 63, 63, 3),
                    jnp.float32)
    a = rn.resnet50(num_classes=10, stem="s2d")
    b = rn.resnet50(num_classes=10, stem="conv")
    va = a.init({"params": jax.random.key(0)}, x, False, None)
    la = a.apply(va, x, False, None)
    lb = b.apply(va, x, False, None)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)
