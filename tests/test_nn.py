"""Layer-level parity tests: BatchNorm / InstanceNorm / SelfNorm vs torch."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from cnsn_tpu.nn import (
    BatchNorm, BatchNorm1dStats, CNSN, CrossNorm, IBN, InstanceNorm, SelfNorm,
    gelu_sig,
)


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestBatchNorm:
    def test_train_and_eval_match_torch(self):
        rng = np.random.RandomState(0)
        x = rng.randn(6, 5, 4, 3).astype(np.float32)  # NCHW
        tbn = tnn.BatchNorm2d(5)
        tbn.train()
        t_out1 = tbn(torch.from_numpy(x)).detach().numpy()
        t_out2 = tbn(torch.from_numpy(x * 2)).detach().numpy()
        tbn.eval()
        t_eval = tbn(torch.from_numpy(x)).detach().numpy()

        bn = BatchNorm(5)
        variables = bn.init(jax.random.key(0), jnp.asarray(nhwc(x)), False)
        j_out1, mut = bn.apply(variables, jnp.asarray(nhwc(x)), False,
                               mutable=["batch_stats"])
        variables = {**variables, **mut}
        j_out2, mut = bn.apply(variables, jnp.asarray(nhwc(x * 2)), False,
                               mutable=["batch_stats"])
        variables = {**variables, **mut}
        j_eval = bn.apply(variables, jnp.asarray(nhwc(x)), True)

        np.testing.assert_allclose(nhwc(t_out1), np.asarray(j_out1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(nhwc(t_out2), np.asarray(j_out2), rtol=1e-4, atol=1e-5)
        # Running stats (incl. unbiased-var update) must match for eval parity.
        np.testing.assert_allclose(
            tbn.running_var.numpy(),
            np.asarray(variables["batch_stats"]["var"]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(nhwc(t_eval), np.asarray(j_eval), rtol=1e-4, atol=1e-5)


class TestInstanceNorm:
    def test_matches_torch_affine(self):
        rng = np.random.RandomState(1)
        x = rng.randn(3, 4, 6, 5).astype(np.float32)
        tin = tnn.InstanceNorm2d(4, affine=True)
        with torch.no_grad():
            tin.weight.fill_(1.3)
            tin.bias.fill_(-0.2)
        t_out = tin(torch.from_numpy(x)).detach().numpy()

        mod = InstanceNorm(4)
        v = mod.init(jax.random.key(0), jnp.asarray(nhwc(x)))
        v = jax.tree.map(lambda a: a, v)
        v = {"params": {"scale": jnp.full((4,), 1.3), "bias": jnp.full((4,), -0.2)}}
        j_out = mod.apply(v, jnp.asarray(nhwc(x)))
        np.testing.assert_allclose(nhwc(t_out), np.asarray(j_out), rtol=1e-4, atol=1e-5)


class TestSelfNorm:
    def _torch_selfnorm(self, c):
        class TorchSelfNorm(tnn.Module):
            def __init__(self):
                super().__init__()
                self.g_fc = tnn.Conv1d(c, c, kernel_size=2, bias=False, groups=c)
                self.g_bn = tnn.BatchNorm1d(c)

            def forward(self, x):
                n, ch = x.shape[:2]
                var = x.reshape(n, ch, -1).var(dim=2) + 1e-12
                std = var.sqrt().reshape(n, ch, 1, 1)
                mean = x.reshape(n, ch, -1).mean(dim=2).reshape(n, ch, 1, 1)
                stats = torch.cat((mean.squeeze(3), std.squeeze(3)), -1)
                g = torch.sigmoid(self.g_bn(self.g_fc(stats))).reshape(n, ch, 1, 1)
                return x * g

        return TorchSelfNorm()

    def test_matches_torch_train_and_eval(self):
        c = 5
        rng = np.random.RandomState(2)
        x = rng.randn(6, c, 7, 8).astype(np.float32)
        tmod = self._torch_selfnorm(c)
        w = rng.randn(c, 1, 2).astype(np.float32) * 0.3
        with torch.no_grad():
            tmod.g_fc.weight.copy_(torch.from_numpy(w))
        tmod.train()
        t_train = tmod(torch.from_numpy(x)).detach().numpy()
        tmod.eval()
        t_eval = tmod(torch.from_numpy(x)).detach().numpy()

        mod = SelfNorm(c)
        v = mod.init(jax.random.key(0), jnp.asarray(nhwc(x)), False)
        v["params"]["g_fc"] = jnp.asarray(w[:, 0, :])
        j_train, mut = mod.apply(v, jnp.asarray(nhwc(x)), False,
                                 mutable=["batch_stats"])
        v2 = {**v, **mut}
        j_eval = mod.apply(v2, jnp.asarray(nhwc(x)), True)

        np.testing.assert_allclose(nhwc(t_train), np.asarray(j_train), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(nhwc(t_eval), np.asarray(j_eval), rtol=1e-3, atol=1e-4)


class TestCrossNormModule:
    def test_inactive_is_identity_and_active_changes(self):
        x = jnp.asarray(np.random.RandomState(3).randn(4, 8, 8, 3).astype(np.float32))
        mod = CrossNorm(crop="neither", beta=1.0)
        v = mod.init({"params": jax.random.key(0), "crossnorm": jax.random.key(1)},
                     x, jnp.asarray(False))
        out_off = mod.apply(v, x, jnp.asarray(False),
                            rngs={"crossnorm": jax.random.key(2)})
        np.testing.assert_array_equal(np.asarray(out_off), np.asarray(x))
        out_on = mod.apply(v, x, jnp.asarray(True),
                           rngs={"crossnorm": jax.random.key(2)})
        assert not np.allclose(np.asarray(out_on), np.asarray(x))

    def test_none_active_no_rng_needed(self):
        x = jnp.ones((2, 4, 4, 3))
        mod = CrossNorm()
        v = mod.init(jax.random.key(0), x, None)
        out = mod.apply(v, x, None)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestGELU:
    def test_sigmoid_gelu(self):
        x = np.linspace(-3, 3, 31).astype(np.float32)
        expect = x * (1.0 / (1.0 + np.exp(-1.702 * x)))
        np.testing.assert_allclose(np.asarray(gelu_sig(jnp.asarray(x))), expect,
                                   rtol=1e-5, atol=1e-6)


class TestIBN:
    def test_split_semantics(self):
        rng = np.random.RandomState(4)
        x = rng.randn(4, 8, 6, 6).astype(np.float32)  # NCHW, C=8
        mod = IBN(8)
        v = mod.init(jax.random.key(0), jnp.asarray(nhwc(x)), False)
        out, _ = mod.apply(v, jnp.asarray(nhwc(x)), False, mutable=["batch_stats"])
        assert out.shape == nhwc(x).shape
        # First half behaves like IN: per-sample/channel mean ~ 0.
        first = np.asarray(out)[..., :4]
        np.testing.assert_allclose(first.mean(axis=(1, 2)), 0.0, atol=1e-4)


class TestPerReplicaBatchNorm:
    def test_groups_match_per_half_torch(self):
        rng = np.random.RandomState(7)
        x = rng.randn(8, 4, 4, 3).astype(np.float32)
        bn = BatchNorm(3, groups=2)
        v = bn.init(jax.random.key(0), jnp.asarray(x), False)
        out, mut = bn.apply(v, jnp.asarray(x), False,
                            mutable=["batch_stats"])
        ta, tb = tnn.BatchNorm2d(3), tnn.BatchNorm2d(3)
        ta.train(), tb.train()
        oa = ta(torch.from_numpy(x[:4].transpose(0, 3, 1, 2)))
        ob = tb(torch.from_numpy(x[4:].transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(out[:4]),
                                   oa.detach().numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[4:]),
                                   ob.detach().numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)
        # running stats follow group 0 (DataParallel master semantics)
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                                   ta.running_var.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestMultiBatchNorm:
    def test_domain_banks_are_independent(self):
        from cnsn_tpu.nn import MultiBatchNorm
        rng = np.random.RandomState(8)
        x0 = jnp.asarray(rng.randn(4, 3, 3, 2).astype(np.float32))
        x1 = jnp.asarray(rng.randn(4, 3, 3, 2).astype(np.float32) * 5 + 2)
        mod = MultiBatchNorm(2, num_domains=2)
        v = mod.init(jax.random.key(0), x0, False, 0)
        _, mut = mod.apply(v, x0, False, 0, mutable=["batch_stats"])
        v = {**v, **mut}
        _, mut = mod.apply(v, x1, False, 1, mutable=["batch_stats"])
        stats = mut["batch_stats"]
        assert not np.allclose(np.asarray(stats["mean"][0]),
                               np.asarray(stats["mean"][1]))
        # eval uses the selected bank
        e0 = mod.apply({**v, **mut}, x0, True, 0)
        e1 = mod.apply({**v, **mut}, x0, True, 1)
        assert not np.allclose(np.asarray(e0), np.asarray(e1))


def test_bn_ghost_stats_sampling():
    """stats_sample=s computes batch stats from the leading s rows
    (ghost BN; the reference's per-replica DataParallel BN uses
    per-shard stats the same way).  sample=0 is bit-identical to full;
    sampled stats stay within sampling noise of full-batch stats."""
    from cnsn_tpu.nn.norm import BatchNorm
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 8, 8, 16).astype(np.float32) * 2 + 3)
    v = BatchNorm(16).init(jax.random.key(0), x, False)

    full, mf = BatchNorm(16).apply(v, x, False, mutable=["batch_stats"])
    same, _ = BatchNorm(16, stats_sample=0).apply(v, x, False,
                                                  mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(full), np.asarray(same))

    sub, ms = BatchNorm(16, stats_sample=16).apply(v, x, False,
                                                   mutable=["batch_stats"])
    # normalized outputs differ only by stats sampling noise
    assert 0 < float(jnp.abs(full - sub).max()) < 0.5
    # sampled running stats track the true moments
    rm = np.asarray(ms["batch_stats"]["mean"])
    true_m = np.asarray(x.mean(axis=(0, 1, 2))) * 0.1  # momentum step
    np.testing.assert_allclose(rm, true_m, atol=0.05)


def test_batchnorm_pallas_stats_equivalence():
    """BatchNorm with the streaming Pallas stats kernel (interpret on
    CPU) matches the jnp shifted path: outputs, running stats, grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnsn_tpu.nn.norm import BatchNorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 64).astype(np.float32) + 0.7)

    outs = {}
    for use_pallas in (False, True):
        bn = BatchNorm(64, use_pallas=use_pallas)
        v = bn.init({"params": jax.random.key(0)}, x, False)
        # seed a nonzero running mean so the shifted path is exercised
        v = {"params": v["params"],
             "batch_stats": {"mean": jnp.full((64,), 0.3),
                             "var": jnp.ones((64,))}}

        def loss(params, x):
            out, mut = bn.apply({"params": params,
                                 "batch_stats": v["batch_stats"]},
                                x, False, mutable=["batch_stats"])
            return jnp.sum(out * out), (out, mut)

        (l, (out, mut)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(v["params"], x)
        outs[use_pallas] = (np.asarray(out), jax.tree_util.tree_map(np.asarray, mut),
                            jax.tree_util.tree_map(np.asarray, g))

    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            outs[True][1]["batch_stats"][k], outs[False][1]["batch_stats"][k],
            rtol=1e-5, atol=1e-6)
    gs_p, gs_j = outs[True][2], outs[False][2]
    np.testing.assert_allclose(gs_p[1], gs_j[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gs_p[0]["scale"], gs_j[0]["scale"],
                               rtol=1e-5, atol=1e-5)
